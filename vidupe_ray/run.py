"""Job entry point: ``python -m vidupe_ray.run --input DIR --output DIR``.

The ``ray job submit`` surface (SURVEY.md §2.11): on a cluster,

    ray job submit --working-dir . -- python -m vidupe_ray.run \\
        --input s3://corpus/parquet --output s3://out/dedup

Owns the Ray session (scripts own sessions; the library never calls
ray.init — driver contract).  Writes resumable partitioned Parquet outputs
plus metrics/lineage JSON (the S8/S9 sinks: where the reference mutated
the filesystem after user confirmation, ``comparison.cpp:388-476``, we
emit datasets with keep/drop verdicts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allocator tuning for Ray worker processes (see bench.py for the measured
# rationale); harmless if already set by the environment
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_ARENA_MAX", "4")
os.environ.setdefault("PYTHONMALLOC", "malloc")


def preflight() -> dict:
    """Environment probe — the ``detectffmpeg`` analogue (SURVEY §2.1 S4;
    the reference refuses to start without its external tool,
    ``mainwindow.cpp:37-44``).  Verifies the execution environment and
    returns the facts for the lineage record; raises on a broken setup
    instead of failing mid-pipeline."""
    import ray
    if not ray.is_initialized():
        raise RuntimeError("preflight: Ray is not initialised")
    r = ray.cluster_resources()
    cpus = int(r.get("CPU", 0))
    store = int(r.get("object_store_memory", 0))
    if cpus < 1:
        raise RuntimeError("preflight: no CPUs in the Ray cluster")
    if store < (1 << 28):
        raise RuntimeError(
            f"preflight: object store too small ({store} bytes)")
    import numpy, pyarrow
    return {"ray": ray.__version__, "numpy": numpy.__version__,
            "pyarrow": pyarrow.__version__, "cpus": cpus,
            "object_store_bytes": store,
            "nodes": len([n for n in ray.nodes() if n.get("Alive")])}


def write_outputs(res, out_dir: str, identity: str | None = None) -> dict:
    """Resumable partitioned parquet per output dataset + metrics json.

    The key-bearing datasets go through ``state.output.resumable_write``
    (hash-partitioned ``part-<b>.parquet`` with atomic rename + manifest):
    a re-run against the same ``out_dir`` with the same run identity
    (corpus key + match config) skips every partition that already
    landed, so output cost after a crash is proportional to the
    unfinished partitions — never one giant file (task brief); a changed
    corpus/config wipes the stale partitions instead of mixing them in.
    """
    from vidupe_ray.state.output import resumable_write
    counts = {}
    for name, ds, key in [("clusters", res.clusters, "doc_id"),
                          ("pairs", res.pairs, "a"),
                          ("rejects", res.rejects, "doc_id")]:
        d = os.path.join(out_dir, name)
        n = ds.count()
        if n:
            manifest = resumable_write(
                ds, d, key, buckets=32,
                identity=None if identity is None else f"{identity}:{name}")
            counts[name] = int(manifest["rows"].sum())
        else:
            os.makedirs(d, exist_ok=True)
            counts[name] = 0
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({**res.metrics, **{f"n_{k}": v for k, v in counts.items()}},
                  f, indent=2, default=str)
    return counts


def main(argv=None):
    p = argparse.ArgumentParser(description="Ray-Data near-dup pipeline")
    p.add_argument("--input", required=True,
                   help="parquet file/dir with (repo,path,commit,lang,content)")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--mode", choices=["jaccard", "simhash"],
                   default="jaccard")
    p.add_argument("--threshold-pct", type=int, default=89)
    p.add_argument("--lang", action="append", default=[],
                   help="lang allowlist entries (repeatable)")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--validate", action="store_true",
                   help="run the corpus sanity report (null identity / "
                        "null content / duplicate doc_id) before the "
                        "pipeline and include it in the summary")
    args = p.parse_args(argv)

    from vidupe_ray.util import silence_benign_schema_warnings
    silence_benign_schema_warnings()
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup, cluster_report
    from vidupe_ray.sources.corpus_source import read_corpus

    cfg = PipelineConfig(mode=args.mode, threshold_pct=args.threshold_pct,
                         lang_allowlist=tuple(args.lang))
    env = preflight()
    if args.checkpoint_dir:
        from vidupe_ray.state.checkpoint import write_lineage
        write_lineage(args.checkpoint_dir, "preflight", env)
    t0 = time.perf_counter()
    sanity = None
    if args.validate:
        from vidupe_ray.sources.corpus_source import corpus_sanity
        sanity = corpus_sanity(read_corpus(args.input), cfg)
    source = read_corpus(args.input, num_blocks=2 * args.num_cpus)
    res = run_dedup(source, cfg,
                    checkpoint_dir=args.checkpoint_dir,
                    skip_repartition=True)
    # run identity for the resumable outputs: file identity of the corpus
    # (path+size+mtime) + the FULL config (thresholds included — unlike
    # the signature checkpoint, outputs DO depend on match-time params)
    from vidupe_ray.state.checkpoint import corpus_cache_key
    import hashlib
    ckey = corpus_cache_key(source, cfg) or "inmem"
    identity = ckey + ":" + hashlib.sha256(
        json.dumps(cfg.to_dict(), sort_keys=True, default=str).encode()
    ).hexdigest()[:16]
    counts = write_outputs(res, args.output, identity=identity)
    report = cluster_report(res.clusters)
    summary = {"wall_sec": round(time.perf_counter() - t0, 2),
               **counts, **report,
               "files_per_sec": round(
                   res.metrics.get("n_input", 0)
                   / max(time.perf_counter() - t0, 1e-9), 1)}
    if sanity is not None:
        summary["sanity"] = sanity
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
