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


def _hot_group_corpus():
    rng = np.random.RandomState(5)
    words = [f"tok{i}" for i in range(500)]
    base = [rng.choice(words) for _ in range(400)]
    rows = {"repo": [], "path": [], "commit": [], "lang": [],
            "content": []}
    for i in range(120):
        toks = list(base)
        toks[(i * 3) % len(toks)] = f"uniq{i}"     # one edit, J ~ 0.965
        rows["repo"].append("hot/r"); rows["path"].append(f"v{i}.py")
        rows["commit"].append("a" * 40); rows["lang"].append("py")
        rows["content"].append(" ".join(toks) + "\n")
    for i in range(200):
        toks = [rng.choice(words) for _ in range(200)]
        rows["repo"].append("u/r"); rows["path"].append(f"u{i}.py")
        rows["commit"].append("b" * 40); rows["lang"].append("py")
        rows["content"].append(" ".join(toks) + f"\n# uid {i}\n")
    return pa.table({k: pa.array(v, pa.string())
                     for k, v in rows.items()})


def test_salting_beats_ring_on_hot_group_pair_recall(ray_session):
    """SURVEY §2.5 J1 / VERDICT r1 item 8: measured strategy comparison.
    A 120-member near-dup class at band_group_cap=16: both strategies must
    produce the same (correct) clusters; salting must emit substantially
    more of the g(g-1)/2 true pairs (measured 0.44 vs 0.12)."""
    import ray.data as rd
    t = _hot_group_corpus()
    true_pairs = 120 * 119 // 2
    out = {}
    for strat in ("ring", "salt"):
        cfg = PipelineConfig(band_group_cap=16, hot_group_strategy=strat)
        res = run_dedup(rd.from_arrow(t), cfg)
        cl = res.clusters.to_pandas()
        out[strat] = {
            "recall": len(res.pairs.to_pandas()) / true_pairs,
            "max_cluster": cl.groupby("cluster_id").size().max(),
            "n_clusters": cl.cluster_id.nunique()}
    assert out["ring"]["max_cluster"] == 120      # connectivity either way
    assert out["salt"]["max_cluster"] == 120
    assert out["ring"]["n_clusters"] == out["salt"]["n_clusters"]
    assert out["salt"]["recall"] >= 2 * out["ring"]["recall"], out
    assert out["salt"]["recall"] >= 0.3, out


def test_trigram_stop_gram_bounds_pair_emission(caplog):
    """VERDICT r3 #1: a boilerplate trigram planted in many docs must NOT
    emit g^2/2 pairs.  Unit level: the bucket kernel drops grams with
    df > hot_gram_cap from intersection counts and logs the drop."""
    import logging
    from vidupe_ray.pipelines.textops import _gram_pairs_bucket
    g = 500
    # every doc shares gram 7 (the boilerplate), plus two unique grams
    df = pd.DataFrame({
        "doc_id": np.repeat(np.arange(g, dtype=np.int64), 3),
        "gram": np.concatenate(
            [[7, 1000 + 2 * d, 1001 + 2 * d] for d in range(g)]
        ).astype(np.int64)})
    with caplog.at_level(logging.WARNING, logger="vidupe_ray.textops"):
        out = _gram_pairs_bucket(df, hot_gram_cap=100)
    assert len(out) == 0                       # no pair from the stop gram
    assert any("stop gram" in r.message for r in caplog.records)
    # below the cap the same gram emits the full g^2/2 pair set
    out2 = _gram_pairs_bucket(df, hot_gram_cap=g)
    assert len(out2) == g * (g - 1) // 2


def test_trigram_jaccard_hot_gram_end_to_end(ray_session, tmp_path):
    """10k docs sharing one boilerplate trigram: the inverted-index join
    completes with bounded emission (the uncapped plan would build ~50M
    pair rows from the single hot gram)."""
    import pyarrow.parquet as pq
    from vidupe_ray.pipelines.textops import trigram_jaccard_pairs
    n = 10_000
    texts = [f"all rights reserved u{i} v{i} w{i}" for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = trigram_jaccard_pairs(str(tmp_path)).to_pandas()
    # docs share ONLY the stop gram -> no surviving pair reaches the
    # 20% Jaccard threshold (and none is even counted)
    assert len(out) == 0
