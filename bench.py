"""Benchmark harness (driver contract).

Runs the headline near-dup pipeline over a deterministic synthetic corpus
sized by the scale factor of ``$GRAFT_SF_DIR`` (plus the training-data ops
over the sf tables) and prints ONE JSON line.

    GRAFT_SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 python bench.py
    python bench.py --scaling     # same job at 8 and 32 CPUs in fresh
                                  # processes; prints throughputs + efficiency

The bench corpus is generated once per (size, seed) and cached as sharded
parquet under /tmp/vidupe_bench so repeated runs measure the pipeline, not
the generator; one untimed read warms the page cache first.
``GRAFT_BENCH_DOCS`` overrides the corpus size (docs) for floor-amortized
scaling legs; the emitted JSON's ``n_docs`` self-describes the run.
``GRAFT_SCALE_REPEATS`` overrides the per-level repeat count in
``--scaling`` (default 2; long floor-amortized legs may use 1 since each
bench invocation already takes best-of-2 internally).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Allocator tuning BEFORE ray.init so worker processes inherit it.  The hot
# kernels allocate multi-MB numpy temporaries and millions of small Python
# strings per batch; with default settings both glibc (mmap/munmap of big
# buffers) and pymalloc (arena munmaps) trigger cross-core TLB-shootdown
# IPIs that serialize 32-way workers.  Routing pymalloc through tuned glibc
# keeps pages pooled: measured fingerprint throughput at 32-way went
# 13.6k -> 30.1k docs/s (PYTHONMALLOC only affects processes started after
# this point, i.e. exactly the Ray workers).
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_ARENA_MAX", "4")
os.environ.setdefault("PYTHONMALLOC", "malloc")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42

# bench corpus size by scale factor (FIXTURES.md: bench = 50k-500k at
# sf0.1; sized so parallel compute dominates the fixed pipeline overhead
# and the N-vs-4N scaling measurement reflects the system, not the floor)
_SF_DOCS = {"sf0.001": 2_000, "sf0.01": 10_000, "sf0.1": 500_000}


def corpus_dir() -> tuple:
    sf = os.path.basename(SF_DIR.rstrip("/"))
    n = int(os.environ.get("GRAFT_BENCH_DOCS", 0)) or _SF_DOCS.get(sf, 10_000)
    out = f"/tmp/vidupe_bench/{sf}_n{n}_s{SEED}"
    if not os.path.exists(os.path.join(out, "corpus")):
        from vidupe_ray.corpus import write_corpus
        os.makedirs(out, exist_ok=True)
        write_corpus(out, n, seed=SEED, shards=32)
    return os.path.join(out, "corpus"), n


def run_bench() -> dict:
    from vidupe_ray.util import silence_benign_schema_warnings
    silence_benign_schema_warnings()
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup

    cdir, n_docs = corpus_dir()

    # warm page cache (untimed)
    rd.read_parquet(cdir).count()

    cfg = PipelineConfig(
        fingerprint_concurrency=max(2, NUM_CPUS - 2))

    queries = {}

    # ---- headline: end-to-end dedup on the bench corpus -----------------
    # best-of-2: the shared VM's memory subsystem swings run-to-run by up
    # to 2x (BASELINE.md host-noise caveat); both raw values are reported
    from vidupe_ray.sources.corpus_source import read_corpus
    headline_runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = run_dedup(read_corpus(cdir, num_blocks=max(32, 2 * NUM_CPUS)),
                        cfg,
                        skip_repartition=True)
        n_clusters = res.clusters.count()
        headline_runs.append(time.perf_counter() - t0)
    headline = min(headline_runs)
    queries["dedup_corpus"] = round(headline, 3)

    # ---- secondary pipelines over the sf tables -------------------------
    # GRAFT_HEADLINE_ONLY=1 skips them: scaling legs at floor-amortizing
    # corpus sizes time only the headline, so the suite would just burn
    # host bandwidth between the paired measurements.
    headline_only = os.environ.get("GRAFT_HEADLINE_ONLY") == "1"

    def timed(name, fn):
        if headline_only:
            return
        t = time.perf_counter()
        try:
            out = fn(SF_DIR)
            # consume
            if hasattr(out, "count"):
                out.count()
            queries[name] = round(time.perf_counter() - t, 3)
        except Exception as e:          # never fail the whole bench
            queries[name] = f"error: {type(e).__name__}"

    from vidupe_ray.pipelines import textops, ann
    from vidupe_ray.sources.corpus_source import documents_as_corpus
    timed("dedup_documents", lambda sf: run_dedup(
        documents_as_corpus(sf), cfg).clusters)
    timed("doc_stats", textops.doc_stats)
    timed("exact_dedup", textops.exact_dedup_docs)
    timed("token_stats", textops.token_stats_by_lang)
    timed("top_tokens", textops.top_tokens)
    timed("length_quantiles", textops.length_quantiles)
    timed("doc_embedding_join", ann.doc_embedding_join)
    timed("quality", textops.quality_scores)
    timed("langid", textops.langid_guess)
    timed("trigram_jaccard", textops.trigram_jaccard_pairs)
    timed("containment_pairs", textops.containment_pairs)
    timed("repetition_score", textops.repetition_score)
    timed("decontaminate", textops.decontaminate)
    timed("gram_ownership", textops.gram_ownership)
    timed("ann_topk", ann.ann_topk)
    timed("ann_topk_ivf", ann.ivf_topk)
    timed("embedding_neardup", ann.embedding_neardup_pairs)
    timed("embedding_clusters", ann.embedding_clusters)
    timed("semdedup", ann.semdedup)
    timed("tfidf_top_terms", textops.tfidf_top_terms)
    timed("distinct_contents", textops.distinct_contents)
    timed("hll_distinct_contents", textops.hll_distinct_contents)
    from vidupe_ray.pipelines import relational
    timed("pricing_summary", relational.pricing_summary)
    timed("part_type_sales", relational.part_type_sales)

    result = {
        "metric": "e2e_dedup_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "files_per_sec": round(n_docs / headline, 1),
        "headline_runs_sec": [round(x, 3) for x in headline_runs],
        "n_clusters": n_clusters,
        "shuffle_bytes": res.metrics.get("shuffle_bytes", {}),
    }
    ray.shutdown()
    # Host capacity at measurement time (BASELINE.md host-noise caveat):
    # effective cores via the cache-resident busy loop, so a degraded
    # shared-VM window is visible in the recorded JSON itself.
    try:
        result["host_effective_cores"] = round(
            _compute_probe(NUM_CPUS) / _compute_probe(1), 1)
        result["host_mem_bw_gbs"] = round(_membw_probe(), 1)
    except Exception:
        pass
    return result


def _compute_probe(k: int, seconds: float = 1.5) -> float:
    """Effective parallel compute rate of the HOST right now (cache-
    resident busy loop, no memory traffic) — calibrates shared-VM noise
    so a scaling number can be judged against the machine's actual
    capacity at measurement time."""
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


def _membw_probe(mb: int = 512, reps: int = 3) -> float:
    """Single-stream DRAM copy bandwidth (GB/s) right now.  The compute
    probe misses memory-subsystem degradation — a window was measured at
    4.3x the record wall while the busy-loop probe read 22.8/32 effective
    cores — so both host axes are recorded with every run."""
    import numpy as np
    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.copyto(b, a)
        dt = time.perf_counter() - t0
        best = max(best, (2 * a.nbytes) / dt / 1e9)
    return best


def run_scaling(repeats: int = 2):
    """Same job at two parallelism levels in fresh processes — the sandbox
    stand-in for N vs 4N nodes (BASELINE.json north_rule).

    Each level runs ``repeats`` times and the BEST throughput per level is
    used: the shared VM's run-to-run wall variance is ±20-50% (identical
    code measured 29-62 s at 32 CPUs within one session), so a single
    pairing measures host noise, not the system.  A busy-loop compute
    probe is recorded alongside so the host's capacity at measurement
    time is part of the record.

    ``GRAFT_SCALE_LO``/``GRAFT_SCALE_HI`` override the two levels
    (default 8 vs 32).  The 2-vs-8 pairing is also reported in
    BASELINE.md: this VM's single memory controller saturates at ~8
    workers (measured DRAM curve 6.3/18.7/23.7 GB/s at 1/8/32 procs),
    so 8→32 measures the shared controller, not the engine; 2→8 sits
    below saturation and is the closer stand-in for N→4N *nodes*,
    where each node contributes its own DRAM.
    """
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", repeats))
    if repeats < 1:
        raise ValueError("GRAFT_SCALE_REPEATS must be >= 1")

    def one(ncpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # ensure the corpus cache exists before timing anything
    corpus_dir()
    probe1 = _compute_probe(1)
    probe_lo = _compute_probe(lo) / probe1
    probe_hi = _compute_probe(hi) / probe1
    runs_lo, runs_hi = [], []
    for _ in range(repeats):            # interleave to share noise windows
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = max(runs_lo, key=lambda r: r["files_per_sec"])
    r_hi = max(runs_hi, key=lambda r: r["files_per_sec"])
    tp_lo = r_lo["files_per_sec"]
    tp_hi = r_hi["files_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "files_per_sec_lo": tp_lo, "files_per_sec_hi": tp_hi,
        "all_files_per_sec_lo": [r["files_per_sec"] for r in runs_lo],
        "all_files_per_sec_hi": [r["files_per_sec"] for r in runs_hi],
        "host_mem_bw_gbs": {"lo": [r.get("host_mem_bw_gbs") for r in runs_lo],
                            "hi": [r.get("host_mem_bw_gbs") for r in runs_hi]},
        "host_effective_cores": {"lo": round(probe_lo, 1),
                                 "hi": round(probe_hi, 1)},
        "host_compute_scaling_ceiling": round(probe_hi / probe_lo
                                              / (hi / lo), 3),
        "sf": r_lo["sf"], "n_docs": r_lo["n_docs"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
