"""5M-doc stress (round-3; VERDICT r2 #7): one more 2.5x step over the 2M
run to check candidate linearity, the distributed plans' behavior, and
cluster byte-stability at a scale where the pin auto-gate turns OFF
(corpus estimate exceeds the object-store fraction), i.e. the true
100-TB-shaped configuration: unpinned source re-reads + bucketed verify +
distributed alternating-star CC.

    python tools/stress_5m.py [n_docs]     # default 5_000_000
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


def main(n: int = 5_000_000, seed: int = 42):
    out = f"/tmp/vidupe_bench/sf0.1_n{n}_s{seed}"
    if not os.path.exists(os.path.join(out, "corpus")):
        # generate in SUBPROCESSES: the driver-side generator inflates the
        # process heap to ~5 GB per million docs, and the MALLOC_TRIM
        # tuning above (needed by the pipeline workers) prevents glibc
        # from ever returning those freed pages — a 10M-doc in-process
        # generation OOM-wedged the run and a single-subprocess 20M
        # generation was OOM-KILLED at ~104 GB.  Chunked generation
        # bounds per-process heap and parallelizes the chunks.
        t0 = time.perf_counter()
        if n > 6_000_000:
            sys.path.insert(0, REPO)
            from vidupe_ray.corpus import write_corpus_chunked
            write_corpus_chunked(out, n, seed=seed)
        else:
            import subprocess
            os.makedirs(out, exist_ok=True)
            subprocess.run([sys.executable, "-c", (
                "import sys; sys.path.insert(0, %r); "
                "from vidupe_ray.corpus import write_corpus; "
                "write_corpus(%r, %d, seed=%d, shards=64)"
                % (REPO, out, n, seed))], check=True)
        print(f"# corpus generated in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    # the VM's block device advertises 252 GB but only ~93 GB is real
    # (df: used+avail); Ray's file-system monitor computes its 95% kill
    # threshold on the ADVERTISED capacity, i.e. it aborts object
    # creation once avail < 12.6 GB.  0.98 moves the floor to ~5 GB —
    # honest on this box because avail (not capacity) is the true number
    os.environ.setdefault("RAY_local_fs_capacity_threshold", "0.98")

    # disk/shm watcher: the three failed 20M runs died on OutOfDiskError
    # with the raylet's "Spilled" counter explaining only ~8 of ~38 GB —
    # the rest was plasma FALLBACK allocation (store full of referenced
    # blocks).  Sample both channels so the next wall is attributable.
    import shutil
    import threading

    def _watch():
        while True:
            try:
                d = shutil.disk_usage("/")
                s = shutil.disk_usage("/dev/shm")
                print(f"# disk avail {d.free >> 30} GiB | shm used "
                      f"{(s.total - s.free) >> 30} GiB", file=sys.stderr,
                      flush=True)
            except Exception:
                pass
            time.sleep(20)

    threading.Thread(target=_watch, daemon=True).start()

    import ray
    # big object store for the 10M-scale band-emission sort: default
    # sizing (~29 GiB) forces tens of GB through Ray's disk spill, and
    # Ray 2.49's raylet has a recursive SpillObjectsInternal ->
    # PushSpillWorker path that STACK-OVERFLOWS under that pressure
    # (captured in raylet.out at 10M docs).  A 64 GiB store keeps the
    # sort resident; spill remains the overflow path, not the steady
    # state.  Worker heaps get the rest of the 125 GiB box.
    # 20M docs roughly doubles the resident sort payload of the 10M run
    # (band rows + signatures scale linearly); 64 GiB was comfortable at
    # 10M (zero spill), so take the store to 76 GiB above 12M docs and
    # leave ~45 GiB for worker heaps on the 125 GiB box.
    store = (76 if n > 12_000_000 else 64) * (1 << 30)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             object_store_memory=store,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup, cluster_report
    from vidupe_ray.sources.corpus_source import read_corpus

    cfg = PipelineConfig(fingerprint_concurrency=30)
    # keep per-block content bytes at the proven 10M shape (~150k docs /
    # ~220 MB per block): fixed 64 blocks at 20M would double block size
    # and with it every map task's peak heap
    blocks = max(64, n * 64 // 10_000_000)
    t0 = time.perf_counter()
    res = run_dedup(read_corpus(os.path.join(out, "corpus"),
                                num_blocks=blocks),
                    cfg, skip_repartition=True)
    n_clusters = res.clusters.count()
    wall = time.perf_counter() - t0
    rep = cluster_report(res.clusters)
    print(json.dumps({
        "n_docs": n,
        "wall_sec": round(wall, 1),
        "files_per_sec": round(n / wall, 1),
        "n_candidates": res.metrics.get("n_candidates"),
        "cand_key_chunks": res.metrics.get("cand_key_chunks"),
        "n_pairs": res.metrics.get("n_pairs"),
        "n_clusters": n_clusters,
        "dup_clusters": rep["dup_clusters"],
        "reclaimable_bytes": rep["reclaimable_bytes"],
        "pin_auto": res.metrics.get("pin_corpus_auto"),
        "stage_sec": {k: round(v, 1) for k, v in res.metrics.items()
                      if k.startswith("t_")},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000)
