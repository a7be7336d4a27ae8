"""Golden e2e in mode='simhash' (the pHash-mode analogue, the reference
DEFAULT ``prefs.h:14``): phase-1 gate decides alone; oracle must agree."""

import numpy as np
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.corpus import generate_corpus
from vidupe_ray.pipelines import oracle as O
from vidupe_ray.pipelines.dedup import run_dedup

CFG = PipelineConfig(mode="simhash")


@pytest.fixture(scope="module")
def results(ray_session):
    import ray.data as rd
    corpus, truth = generate_corpus(500, seed=21)
    res = run_dedup(rd.from_arrow(corpus), CFG)
    pipe = res.clusters.to_pandas()
    doc_ids = np.asarray(truth["doc_id"].to_pylist(), dtype=np.int64)
    pairs = O.brute_force_pairs(corpus, doc_ids, CFG)
    from vidupe_ray.functions.text import canonicalize
    nonempty = np.array([bool(canonicalize(t))
                         for t in corpus["content"].to_pylist()])
    oracle = O.union_find_clusters(doc_ids[nonempty], pairs)
    return pipe, oracle


def test_simhash_mode_recall(results):
    pipe, oracle = results
    recall = O.cluster_pair_recall(oracle, pipe)
    assert recall >= 0.99, f"simhash-mode recall {recall:.4f}"


def test_simhash_mode_precision(results):
    pipe, oracle = results
    precision = O.cluster_pair_recall(pipe, oracle)
    assert precision >= 0.99, f"simhash-mode precision {precision:.4f}"


def test_simhash_mode_grid_path_byte_identical(ray_session):
    """The grid verify/join plans must be byte-identical in simhash mode
    too (the pHash-mode analogue skips the Jaccard decision but rides the
    same phase-2 join)."""
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup
    corpus, _ = generate_corpus(500, seed=3)
    base = PipelineConfig(fingerprint_concurrency=2, mode="simhash")
    tiny = PipelineConfig(fingerprint_concurrency=2, mode="simhash",
                          broadcast_cap=100, cc_small_graph_threshold=10)
    res_b = run_dedup(rd.from_arrow(corpus), base)
    res_t = run_dedup(rd.from_arrow(corpus), tiny)
    cb = (res_b.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    ct = (res_t.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(cb, ct)
    pb = res_b.pairs.to_pandas()
    pt = res_t.pairs.to_pandas()
    assert set(zip(pb["a"], pb["b"])) == set(zip(pt["a"], pt["b"]))
