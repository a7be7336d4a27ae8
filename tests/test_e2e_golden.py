"""Golden end-to-end: Ray pipeline vs brute-force all-pairs oracle
(SURVEY.md §5.2-5.3).  Acceptance per FIXTURES.md §3:

- dup-pair recall >= 0.99 vs oracle clusters
- per-row sha256 equality (the BASELINE.json invariant)
- permutation invariance of the cluster partition
- self-duplication property
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.corpus import generate_corpus
from vidupe_ray.pipelines import oracle as O
from vidupe_ray.pipelines.dedup import run_dedup

N_DOCS = 900
CFG = PipelineConfig(fingerprint_concurrency=2)


@pytest.fixture(scope="module")
def corpus_truth():
    return generate_corpus(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def pipeline_result(ray_session, corpus_truth):
    import ray.data as rd
    corpus, _ = corpus_truth
    res = run_dedup(rd.from_arrow(corpus), CFG)
    return res, res.clusters.to_pandas()


@pytest.fixture(scope="module")
def oracle_result(corpus_truth):
    corpus, truth = corpus_truth
    doc_ids = np.asarray(truth["doc_id"].to_pylist(), dtype=np.int64)
    pairs = O.brute_force_pairs(corpus, doc_ids, CFG)
    # the pipeline rejects empty-canonical docs; oracle clusters likewise
    from vidupe_ray.functions.text import canonicalize
    nonempty = np.array([bool(canonicalize(t))
                         for t in corpus["content"].to_pylist()])
    clusters = O.union_find_clusters(doc_ids[nonempty], pairs)
    return pairs, clusters


def test_sha256_invariant(pipeline_result, corpus_truth):
    corpus, _ = corpus_truth
    res, _ = pipeline_result
    got = res.docs.select_columns(["doc_id", "sha256"]).to_pandas()
    want = {
        did: hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest()
        for did, t in zip(
            [r for r in corpus_truth[1]["doc_id"].to_pylist()],
            corpus["content"].to_pylist())}
    assert len(got) == corpus.num_rows
    mism = sum(1 for did, s in zip(got.doc_id, got.sha256)
               if want[did] != s)
    assert mism == 0


def test_dup_pair_recall_vs_oracle(pipeline_result, oracle_result):
    _, pipe_clusters = pipeline_result
    _, oracle_clusters = oracle_result
    recall = O.cluster_pair_recall(oracle_clusters, pipe_clusters)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"


def test_precision_vs_oracle(pipeline_result, oracle_result):
    """The pipeline must not invent couplings the oracle lacks: precision of
    co-clustered pairs (oracle is exhaustive, so any pipeline pair should
    be oracle-co-clustered)."""
    _, pipe_clusters = pipeline_result
    _, oracle_clusters = oracle_result
    precision = O.cluster_pair_recall(pipe_clusters, oracle_clusters)
    assert precision >= 0.99, f"dup-pair precision {precision:.4f} < 0.99"


def test_exact_groups_cluster_together(pipeline_result, corpus_truth):
    _, cl = pipeline_result
    _, truth = corpus_truth
    tr = truth.to_pandas()
    m = cl.merge(tr, on="doc_id")
    for klass in ["exact", "whitespace"]:
        sub = m[(m["class"] == klass) & (m.group_id >= 0)]
        sizes = sub.groupby("group_id").size()
        nuniq = sub.groupby("group_id")["cluster_id"].nunique()
        multi = sizes[sizes > 1].index
        assert (nuniq.loc[multi] == 1).all(), f"{klass} groups split"


def test_permutation_invariance(ray_session, corpus_truth, pipeline_result):
    """SURVEY.md §5.3a: shuffling input row order leaves the cluster
    partition unchanged (min-reduction determinism)."""
    import ray.data as rd
    corpus, _ = corpus_truth
    rng = np.random.RandomState(7)
    perm = rng.permutation(corpus.num_rows)
    shuffled = corpus.take(pa.array(perm))
    res2 = run_dedup(rd.from_arrow(shuffled), CFG)
    cl2 = res2.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    _, cl1 = pipeline_result
    cl1 = cl1.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        cl1[["doc_id", "cluster_id"]], cl2[["doc_id", "cluster_id"]])


def test_self_duplication_property(ray_session):
    """SURVEY.md §5.3b: appending an exact copy of any row lands it in the
    original's cluster."""
    import ray.data as rd
    corpus, truth = generate_corpus(200, seed=9)
    dup = corpus.slice(5, 1).to_pydict()
    dup["path"] = [dup["path"][0] + ".copy"]
    extended = pa.concat_tables([corpus, pa.table(
        {k: pa.array(v, corpus.schema.field(k).type)
         for k, v in dup.items()})])
    res = run_dedup(rd.from_arrow(extended), CFG)
    cl = res.clusters.to_pandas()
    from vidupe_ray.functions.text import doc_id_for
    orig_id = doc_id_for(corpus["repo"][5].as_py(),
                         corpus["path"][5].as_py(),
                         corpus["commit"][5].as_py())
    copy_id = doc_id_for(dup["repo"][0], dup["path"][0], dup["commit"][0])
    c = cl.set_index("doc_id")["cluster_id"]
    assert c.loc[orig_id] == c.loc[copy_id]
