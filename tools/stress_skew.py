"""Adversarial-skew stress (round 5): a hot shared-boilerplate class at
SCALE — 5% of a 2M-doc corpus shares one license header, so the header's
bottom-k shingle hashes become deterministically hot anchor keys with
~100k members each.  The small-scale skew test (tests/test_skew.py, 600
docs) proves the salting semantics; this run proves the same machinery
holds when one key's group is 400x the ``band_group_cap``:

- candidate emission must stay O(g * cap) per hot key, never g^2/2
  (salted subgroup all-pairs + cross-salt links, state/bucketing.py);
- the hotband docs must NOT merge into mega-clusters (false-positive
  control: header-only overlap fails the Jaccard gate);
- planted exact/whitespace classes must still cluster (recall is not
  sacrificed to the cap).

    python tools/stress_skew.py [n_docs] [hot_group]   # default 2M / 100k
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


def main(n: int = 2_000_000, hot: int = 100_000, seed: int = 42):
    out = f"/tmp/vidupe_bench/skew_n{n}_h{hot}_s{seed}"
    if not os.path.exists(os.path.join(out, "corpus")):
        # subprocess generation (driver heap hygiene — stress_5m.py note)
        import subprocess
        os.makedirs(out, exist_ok=True)
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r); "
            "from vidupe_ray.corpus import write_corpus; "
            "write_corpus(%r, %d, seed=%d, shards=64, hotband_group=%d)"
            % (REPO, out, n, seed, hot))], check=True)
        print(f"# corpus generated in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    os.environ.setdefault("RAY_local_fs_capacity_threshold", "0.98")

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             object_store_memory=48 * (1 << 30), logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup, cluster_report
    from vidupe_ray.sources.corpus_source import read_corpus

    cfg = PipelineConfig(fingerprint_concurrency=30)
    blocks = max(64, n * 64 // 10_000_000)
    t0 = time.perf_counter()
    res = run_dedup(read_corpus(os.path.join(out, "corpus"),
                                num_blocks=blocks),
                    cfg, skip_repartition=True)
    n_clusters = res.clusters.count()
    wall = time.perf_counter() - t0
    rep = cluster_report(res.clusters)

    # hot-group accounting from the verified pairs' group_size column:
    # pairs that came from groups beyond the cap, and the max group seen
    pairs_pd = res.pairs.to_pandas()
    capped = pairs_pd[pairs_pd["group_size"] > cfg.band_group_cap] \
        if len(pairs_pd) else pairs_pd
    max_group = int(pairs_pd["group_size"].max()) if len(pairs_pd) else 0

    # false-positive control: hotband docs must stay ~singletons
    truth = pd.read_parquet(os.path.join(out, "truth.parquet"))
    cl = res.clusters.to_pandas()
    m = cl.merge(truth, on="doc_id")
    hotrows = m[m["class"] == "hotband"]
    hot_uniq = int(hotrows["cluster_id"].nunique())
    # recall control: exact groups still collapse to one cluster each
    ex = m[(m["class"] == "exact") & (m["group_id"] >= 0)]
    ex_ok = float((ex.groupby("group_id")["cluster_id"].nunique() == 1)
                  .mean()) if len(ex) else 1.0

    print(json.dumps({
        "n_docs": n, "hot_group": hot,
        "wall_sec": round(wall, 1),
        "files_per_sec": round(n / wall, 1),
        "n_candidates": res.metrics.get("n_candidates"),
        "cand_key_chunks": res.metrics.get("cand_key_chunks"),
        "n_pairs": res.metrics.get("n_pairs"),
        "n_clusters": n_clusters,
        "dup_clusters": rep["dup_clusters"],
        "max_pair_group_size": max_group,
        "pairs_from_capped_groups": int(len(capped)),
        "hotband_unique_cluster_frac": round(hot_uniq / max(len(hotrows),
                                                            1), 4),
        "exact_groups_single_cluster_frac": round(ex_ok, 4),
        "stage_sec": {k: round(v, 1) for k, v in res.metrics.items()
                      if k.startswith("t_")},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
