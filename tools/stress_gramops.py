"""Scale stress for the corpus-hygiene gram operators (round 5):
containment_pairs / decontaminate / gram_ownership / repetition_score at
2M docs, with planted classes that make every output checkable and one
adversarial hot gram that must NOT blow up pair emission.

Corpus (deterministic, synthesized under /tmp — the small-scale semantics
are oracle-checked at sf0.01; this run proves the SHAPE holds at 4x the
bench corpus):

- 2M docs x 30 tokens from a 50k-token vocab (random 5-grams collide with
  probability ~0: any overlap below is planted, so expected outputs are
  exact counts, not estimates);
- id %% 1000 == 0  -> benchmark docs (decontaminate's bench_mod=1000
  slice), each carrying an 8-token shared span;
- id %% 1000 == 7  -> contaminated: same span planted mid-doc;
- id %% 1000 == 13 -> subset dups: the first 15 tokens of doc id-1
  (containment must emit (id-1, id) at 1.0; Jaccard would dilute it);
- id %% 1000 == 21 -> verbatim copies of doc id-1 (gram_ownership must
  give them n_novel == 0);
- id %% 1000 == 34 -> repeated-phrase docs (dup_bigram_ppm > 900k);
- id %% 20  == 3   -> 100k docs sharing one 5-token boilerplate header:
  ONE gram with df=100k, 24x containment's hot_gram_cap — the stop-gram
  drop must bound pair emission (g^2/2 here would be 5e9 pairs).

    python tools/stress_gramops.py [n_docs]   # default 2,000,000
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _k, _v in (("MALLOC_MMAP_THRESHOLD_", "1073741824"),
               ("MALLOC_TRIM_THRESHOLD_", "1073741824"),
               ("MALLOC_ARENA_MAX", "4"), ("PYTHONMALLOC", "malloc")):
    os.environ.setdefault(_k, _v)

_GEN = r"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

n = int(sys.argv[1]); out = sys.argv[2]
VOCAB = np.array(["w%d" % i for i in range(50_000)])
SPAN = " ".join("shared%d" % i for i in range(8))
HEADER = "hot0 hot1 hot2 hot3 hot4"
CHUNK = 100_000

writer = None
prev_tail = None  # last doc text of the previous chunk (for id-1 plants)
for lo in range(0, n, CHUNK):
    hi = min(lo + CHUNK, n)
    rng = np.random.RandomState(1234 + lo // CHUNK)
    ids = np.arange(lo, hi, dtype=np.int64)
    toks = VOCAB[rng.randint(0, len(VOCAB), size=(hi - lo, 30))]
    texts = [" ".join(row) for row in toks]
    m = ids % 1000
    for j in range(hi - lo):
        i = ids[j]
        if m[j] == 0 or m[j] == 7:          # bench / contaminated
            parts = texts[j].split(" ")
            texts[j] = " ".join(parts[:10]) + " " + SPAN + " " + \
                " ".join(parts[18:])
        elif m[j] == 34:                    # repeated phrase
            # 2-token phrase x15 -> 29 bigrams, 2 distinct -> 931,034 ppm
            texts[j] = " ".join(["rep%d rep%d" % (i % 7, (i + 1) % 7)] * 15)
        if i % 20 == 3:                     # hot boilerplate header
            texts[j] = HEADER + " " + texts[j]
    # id-1 plants AFTER base text is final (header may prefix id-1)
    for j in range(hi - lo):
        if m[j] == 13 or m[j] == 21:
            src = texts[j - 1] if j > 0 else prev_tail
            texts[j] = " ".join(src.split(" ")[:15]) if m[j] == 13 else src
    prev_tail = texts[-1]
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * (hi - lo), pa.string()),
        "source": pa.array(["s%d" % (i % 20) for i in ids], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    if writer is None:
        writer = pq.ParquetWriter(os.path.join(out, "documents.parquet"),
                                  t.schema)
    writer.write_table(t, row_group_size=25_000)
writer.close()
"""


def main(n: int = 2_000_000):
    out = f"/tmp/vidupe_bench/gramops_n{n}"
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        import subprocess
        os.makedirs(out, exist_ok=True)
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-c", _GEN, str(n), out],
                       check=True)
        print(f"# corpus generated in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             object_store_memory=48 * (1 << 30), logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from vidupe_ray.pipelines import textops

    report = {"n_docs": n}

    # --- containment: subset recall + hot-gram bound ---------------------
    t0 = time.perf_counter()
    cp = textops.containment_pairs(out).to_pandas()
    report["containment_sec"] = round(time.perf_counter() - t0, 1)
    report["containment_pairs"] = len(cp)
    planted = ((cp["b"] % 1000 == 13) & (cp["a"] == cp["b"] - 1)
               & (cp["containment_ppm"] == 1_000_000))
    n_13 = sum(1 for i in range(n) if i % 1000 == 13)
    report["containment_subset_recall"] = round(int(planted.sum()) / n_13, 4)
    # the hot gram alone would emit ~5e9 pairs; the stop-gram drop must
    # keep the output within the planted families (+ shared-span cliques)
    assert len(cp) < 50_000_000, "hot-gram blowup"

    # --- decontaminate: exact flagged set --------------------------------
    t0 = time.perf_counter()
    dc = textops.decontaminate(out, bench_mod=1000).to_pandas()
    report["decontaminate_sec"] = round(time.perf_counter() - t0, 1)
    flagged = set(dc["doc_id"])
    expect = {i for i in range(n) if i % 1000 == 7}
    report["decontaminate_flagged"] = len(flagged)
    report["decontaminate_expected"] = len(expect)
    report["decontaminate_exact"] = flagged == expect

    # --- gram_ownership: copies own nothing ------------------------------
    t0 = time.perf_counter()
    go = textops.gram_ownership(out).to_pandas()
    report["ownership_sec"] = round(time.perf_counter() - t0, 1)
    copies = go[go["doc_id"] % 1000 == 21]
    subsets = go[go["doc_id"] % 1000 == 13]
    report["ownership_rows"] = len(go)
    report["copies_all_zero_novel"] = bool((copies["n_novel"] == 0).all())
    report["subsets_all_zero_novel"] = bool((subsets["n_novel"] == 0).all())
    report["sum_novel"] = int(go["n_novel"].sum())
    report["sum_grams"] = int(go["n_grams"].sum())

    # --- repetition: planted class scores high ---------------------------
    t0 = time.perf_counter()
    rs = textops.repetition_score(out).to_pandas()
    report["repetition_sec"] = round(time.perf_counter() - t0, 1)
    rep = rs[rs["doc_id"] % 1000 == 34]
    report["repetition_class_min_ppm"] = int(rep["dup_bigram_ppm"].min())
    report["repetition_rows"] = len(rs)

    print(json.dumps(report))
    ray.shutdown()
    ok = (report["decontaminate_exact"]
          and report["containment_subset_recall"] == 1.0
          and report["copies_all_zero_novel"]
          and report["subsets_all_zero_novel"]
          and report["repetition_class_min_ppm"] > 900_000)
    print("STRESS " + ("PASS" if ok else "FAIL"), file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000))
