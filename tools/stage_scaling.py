"""Reproduce the per-stage scaling + shuffle-volume table (BASELINE.md).

Runs the flagship pipeline stage by stage at two CPU counts in fresh Ray
sessions (subprocesses), plus the host compute probe, and prints one JSON
line per leg and a final markdown table.  This is the falsifiability
artifact for the scaling-efficiency discussion: every number in
BASELINE.md's round-2 table regenerates from here.

    python tools/stage_scaling.py                  # 8 vs 32, sf0.1 corpus
    GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/stage_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _k, _v in (("MALLOC_MMAP_THRESHOLD_", "1073741824"),
               ("MALLOC_TRIM_THRESHOLD_", "1073741824"),
               ("MALLOC_ARENA_MAX", "4"), ("PYTHONMALLOC", "malloc")):
    os.environ.setdefault(_k, _v)

_CHILD = r"""
import os, sys, time, json
sys.path.insert(0, os.environ["VIDUPE_REPO"])
import ray
ray.init(address="local", num_cpus=int(os.environ["NCPU"]),
         include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from vidupe_ray.config import PipelineConfig
from vidupe_ray.stages import lsh, exact_dedup as ed, verify_contain as vc
from vidupe_ray.stages import cluster as cs
from vidupe_ray.stages.fingerprint import fingerprint_dataset
from vidupe_ray.stages.normalize import normalize_batch
from vidupe_ray.pipelines.dedup import assign_clusters

ncpu = int(os.environ["NCPU"])
cdir = os.environ["VIDUPE_CORPUS"]
cfg = PipelineConfig(fingerprint_concurrency=max(2, ncpu - 2))
rd.read_parquet(cdir).count()            # warm page cache (untimed)
T = {}

def tick(name, fn):
    t0 = time.perf_counter()
    r = fn()
    T[name] = round(time.perf_counter() - t0, 2)
    return r

from vidupe_ray.stages.normalize import batch_doc_ids
import pyarrow as pa

def _stamp(b):
    if "doc_id" in b.column_names:
        return b
    return b.append_column("doc_id", pa.array(batch_doc_ids(b),
                                              pa.int64()))

# fused normalize+fingerprint — matches run_dedup's round-4 structure:
# ONE read->stamp->normalize->fingerprint pass; signatures for all docs,
# losers/rejects dropped by the shared removal refs; content never
# materializes (containment re-reads the source)
from vidupe_ray.stages.fingerprint import _cached_fingerprinter
_SIG_EXTRA = ["n_tokens", "n_shingles", "simhash", "simhash_head",
              "simhash_tail", "minhash", "anchors", "low_content"]

def _fused(b):
    b = _stamp(b)
    meta = normalize_batch(b)
    sigs_t = _cached_fingerprinter(cfg)(b)
    for c in _SIG_EXTRA:
        meta = meta.append_column(c, sigs_t.column(c))
    return meta

wide = tick("normalize_fingerprint", lambda: rd.read_parquet(cdir)
            .repartition(max(32, 2 * ncpu))
            .map_batches(_fused, batch_format="pyarrow",
                         batch_size=cfg.batch_size).materialize())
docs = wide.drop_columns(_SIG_EXTRA)
membership = tick("exact_dedup",
                  lambda: ed.exact_dedup(docs, cfg).materialize())
rejects = docs.filter(expr="status != 'ok'").select_columns(["doc_id"])
removal, stats = ed.removal_refs(membership, cfg, rejects_ids_ds=rejects)
corpus = rd.read_parquet(cdir)          # lazy; containment subset only
winners = ed.apply_winner_filter(corpus, removal)
sigs = tick("sig_filter", lambda: ed.apply_winner_filter(
    wide.select_columns(["doc_id", "lang", "n_bytes"] + _SIG_EXTRA),
    removal).materialize())
cand = tick("candidates",
            lambda: lsh.candidate_pairs(sigs, cfg,
                                        dedupe=False).materialize())
n_cand = cand.count()
ver = tick("verify", lambda: lsh.verify_candidates(
    cand, sigs, cfg, n_pairs=n_cand,
    dedupe_in_cell=True).materialize())
ccand = ver.filter(expr="kind == 'contain_cand'")
contain = tick("containment", lambda: vc.confirm_containment(
    ccand, winners, cfg).materialize())
near = ver.filter(expr="kind == 'near'")
edges = (near.select_columns(["a", "b"])
         .union(contain.select_columns(["a", "b"]))
         .union(ed.exact_edges(membership)))
parents = tick("cc_assign", lambda: assign_clusters(
    docs, cs.connected_components(
        edges, small_graph_threshold=cfg.cc_small_graph_threshold)
    .materialize(), cfg).materialize())
print(json.dumps({"ncpu": ncpu, "stages": T,
                  "total": round(sum(T.values()), 1)}))
ray.shutdown()
"""


def _compute_probe(k: int, seconds: float = 1.5) -> float:
    import multiprocessing as mp

    def burn(q):
        x = 1.0
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < seconds:
            for _ in range(100_000):
                x = x * 1.0000001 + 0.5
            n += 100_000
        q.put(n)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(k)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total / seconds


def main():
    sys.path.insert(0, REPO)
    os.environ.setdefault("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # reuse bench.py's cached corpus
    import bench
    cdir, n_docs = bench.corpus_dir()
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    p1 = _compute_probe(1)
    probes = {lo: _compute_probe(lo) / p1, hi: _compute_probe(hi) / p1}
    legs = {}
    for ncpu in (lo, hi):
        env = dict(os.environ, NCPU=str(ncpu), VIDUPE_REPO=REPO,
                   VIDUPE_CORPUS=cdir)
        out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                             capture_output=True, text=True, check=True)
        legs[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(legs[ncpu]))
    print(f"\nhost probe: {probes[lo]:.1f} eff cores @ {lo}, "
          f"{probes[hi]:.1f} @ {hi} -> compute ceiling "
          f"{probes[hi] / probes[lo] / (hi / lo):.3f}\n")
    print("| stage | %d CPUs | %d CPUs | scaling |" % (lo, hi))
    print("|---|---|---|---|")
    for name in legs[lo]["stages"]:
        a = legs[lo]["stages"][name]
        b = legs[hi]["stages"].get(name, float("nan"))
        print(f"| {name} | {a} s | {b} s | {a / b:.2f}x |")
    print(f"| TOTAL | {legs[lo]['total']} s | {legs[hi]['total']} s | "
          f"{legs[lo]['total'] / legs[hi]['total']:.2f}x |")


if __name__ == "__main__":
    main()
