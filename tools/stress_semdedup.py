"""Scale stress for semdedup (round 5): 1M vectors — 2x the
broadcast-cap gate — so the pair graph comes from the hyperplane-LSH
scale path, components from distributed CC, and the retention rule runs
over real multi-million-row exchanges.

Planted structure (deterministic, synthesized under /tmp — the
small-scale semantics are hash-checked against the DuckDB oracle at
sf0.01; this run proves the SHAPE holds on the at-scale plan):

- ids [0, 2*n_pairs): near-duplicate PAIRS (2i, 2i+1): the odd member is
  the base vector plus tiny noise (cos ~ 0.9998 at threshold 0.99) and
  carries the LARGER n_chars, so for every recovered pair the keep flag
  must land on the ODD id;
- ids [2*n_pairs, n): lone random gaussians (cross-cos ~ 0 +- 0.01 at
  d=64 over millions of pairs stays far below 0.99) — every one must
  keep itself.

Checks: one keep per component (global invariant), planted-pair recall
(LSH tuned bound is >= 0.999/pair at 0.99), keep-lands-on-larger-member
exactness on recovered pairs, singleton self-keep exactness.

    python tools/stress_semdedup.py [n_vectors] [n_pairs]   # 1M / 100k
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

import numpy as np


def synth(out: str, n: int, n_pairs: int, dim: int = 64,
          shards: int = 16) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(1234)
    per = -(-n // shards)
    emb_w = pq.ParquetWriter(
        os.path.join(out, "embeddings.parquet"),
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())]))
    doc_w = pq.ParquetWriter(
        os.path.join(out, "documents.parquet"),
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())]))
    for s in range(shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if lo >= hi:
            break
        ids = np.arange(lo, hi, dtype=np.int64)
        vecs = rng.normal(size=(hi - lo, dim))
        # pair region: odd id = even id's base + tiny noise.  Bases are
        # re-derived from a per-pair seeded generator so shard boundaries
        # never split a pair's randomness.
        in_pair = ids < 2 * n_pairs
        odd = in_pair & (ids % 2 == 1)
        if odd.any():
            for j in np.flatnonzero(odd):
                prng = np.random.RandomState(int(ids[j] // 2))
                vecs[j] = (prng.normal(size=dim)
                           + prng.normal(scale=0.02, size=dim))
        even = in_pair & (ids % 2 == 0)
        if even.any():
            for j in np.flatnonzero(even):
                prng = np.random.RandomState(int(ids[j] // 2))
                vecs[j] = prng.normal(size=dim)
        # odd pair member carries the larger n_chars
        n_chars = np.where(odd, 5000, 100).astype(np.int64)
        emb_w.write_table(pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(hi - lo, np.int32))}))
        doc_w.write_table(pa.table({
            "doc_id": pa.array(ids), "n_chars": pa.array(n_chars)}))
    emb_w.close()
    doc_w.close()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    d = f"/tmp/vidupe_stress_semdedup/n{n}_p{n_pairs}"
    if not os.path.exists(os.path.join(d, "embeddings.parquet")):
        t0 = time.time()
        synth(d, n, n_pairs)
        print(f"synth {time.time() - t0:.1f}s", file=sys.stderr)

    from vidupe_ray.util import silence_benign_schema_warnings
    silence_benign_schema_warnings()
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    from vidupe_ray.pipelines.ann import semdedup

    t0 = time.perf_counter()
    out = semdedup(d, threshold=0.99)
    # consume distributed; collect only the slim verdict columns needed
    # for the planted checks (24 B/row — 24 MB at 1M, driver-safe)
    df = out.to_pandas()
    wall = time.perf_counter() - t0

    keep = dict(zip(df["vec_id"].astype(np.int64),
                    df["keep"].astype(bool)))
    lab = dict(zip(df["vec_id"].astype(np.int64),
                   df["cluster_id"].astype(np.int64)))
    per_comp = df.groupby("cluster_id")["keep"].sum()
    one_keep = bool((per_comp == 1).all())

    merged = [i for i in range(n_pairs) if lab[2 * i] == lab[2 * i + 1]]
    recall = len(merged) / n_pairs
    odd_wins = sum(1 for i in merged
                   if keep[2 * i + 1] and not keep[2 * i])
    lone_ids = np.arange(2 * n_pairs, n, dtype=np.int64)
    lone_self = int(sum(keep[i] for i in lone_ids))

    print(json.dumps({
        "n_vectors": n, "n_planted_pairs": n_pairs,
        "wall_sec": round(wall, 1),
        "rows_out": int(len(df)),
        "one_keep_per_component": one_keep,
        "pair_recall": round(recall, 5),
        "odd_member_kept_on_recovered_pairs":
            f"{odd_wins}/{len(merged)}",
        "singletons_self_keep": f"{lone_self}/{len(lone_ids)}"}))
    ray.shutdown()


if __name__ == "__main__":
    main()
