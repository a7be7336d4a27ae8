"""Scale/skew smoke tests (SURVEY.md §5.5): a big exact-dup class and a hot
anchor band must stay capped and still cluster correctly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.corpus import generate_corpus
from vidupe_ray.pipelines.dedup import run_dedup, cluster_report


@pytest.fixture(scope="module")
def skew_result(ray_session):
    import ray.data as rd
    # 600 docs with a 200-member hotband class (shared license header) and
    # a planted 150-copy exact-dup giant
    corpus, truth = generate_corpus(600, seed=13, hotband_group=200)
    giant = corpus.slice(0, 1).to_pydict()
    rows = {k: [] for k in corpus.column_names}
    for i in range(150):
        rows["repo"].append(f"dup/r{i}")
        rows["path"].append(f"copy{i}.py")
        rows["commit"].append("f" * 40)
        rows["lang"].append("py")
        rows["content"].append(giant["content"][0])
    big = pa.concat_tables([corpus, pa.table(
        {k: pa.array(v, corpus.schema.field(k).type)
         for k, v in rows.items()})])
    cfg = PipelineConfig(band_group_cap=32)   # force capping to engage
    res = run_dedup(rd.from_arrow(big), cfg)
    return res, truth, cfg


def test_exact_giant_is_one_cluster(skew_result):
    res, truth, _ = skew_result
    cl = res.clusters.to_pandas()
    # the 150 copies + original form one cluster of >= 151
    assert (cl.groupby("cluster_id").size() >= 151).any()
    # only ONE fingerprint was computed for the giant group
    assert res.metrics["n_winners"] < res.metrics["n_input"] - 140


def test_hot_groups_are_capped(skew_result):
    res, _, cfg = skew_result
    pairs = res.pairs.to_pandas()
    if len(pairs) == 0:
        pytest.skip("no pairs emitted")
    # group_size column records membership; capped groups exceed the cap in
    # size but their pair count must stay ~cap^2 bounded per group
    big_groups = pairs[pairs.group_size > cfg.band_group_cap]
    if len(big_groups):
        per_group = big_groups.groupby("group_size").size()
        assert (per_group <= cfg.band_group_cap ** 2).all()


def test_hotband_does_not_merge_into_one_cluster(skew_result):
    """Docs sharing only a boilerplate header must NOT collapse into one
    cluster (the false-positive control for hot anchors)."""
    res, truth, _ = skew_result
    cl = res.clusters.to_pandas()
    tr = truth.to_pandas()
    m = cl.merge(tr, on="doc_id")
    hot = m[m["class"] == "hotband"]
    assert hot["cluster_id"].nunique() > len(hot) * 0.8


def test_report_counts(skew_result):
    res, _, _ = skew_result
    rep = cluster_report(res.clusters)
    assert rep["docs_with_dups"] >= 151
    assert rep["reclaimable_bytes"] > 0
