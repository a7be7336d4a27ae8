"""Accuracy and non-vacuousness tests for the distinct-count operators
and the anti-join: the HLL sketch gets a measured error bar against the
exact operator (the cheap-approximation-with-a-measured-gate discipline,
/root/reference/comparison.cpp:141-147), and the anti-join is exercised
on synthetic data where the result is provably non-empty."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    df.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    return str(tmp_path)


def test_distinct_exact_on_testdata(ray_session):
    import duckdb
    from vidupe_ray.pipelines.textops import distinct_contents
    got = int(distinct_contents(SF)["n_distinct"].iloc[0])
    want = duckdb.sql(
        f"SELECT count(DISTINCT text) FROM "
        f"read_parquet('{SF}/documents.parquet')").fetchone()[0]
    assert got == want


@pytest.mark.parametrize("n_distinct", [500, 20_000])
def test_hll_error_bound(ray_session, tmp_path, n_distinct):
    """HLL p=12 standard error is 1.04/sqrt(4096) ~ 1.6%; assert a 3-sigma
    bar (5%) on two cardinalities spanning the linear-counting and raw-
    estimator regimes.  Duplicates are planted to prove the sketch counts
    DISTINCT values, not rows."""
    texts = [f"document body {i} with shared suffix text"
             for i in range(n_distinct)]
    texts = texts + texts[: n_distinct // 2]          # 50% dup rows
    sf = _write_docs(tmp_path, texts)
    from vidupe_ray.pipelines.textops import hll_distinct_contents
    out = hll_distinct_contents(sf)
    est = int(out["n_estimate"].iloc[0])
    assert abs(est - n_distinct) / n_distinct <= 0.05, \
        f"HLL estimate {est} vs true {n_distinct}"


def test_hll_deterministic(ray_session, tmp_path):
    texts = [f"doc {i}" for i in range(1000)]
    sf = _write_docs(tmp_path, texts)
    from vidupe_ray.pipelines.textops import hll_distinct_contents
    a = int(hll_distinct_contents(sf)["n_estimate"].iloc[0])
    b = int(hll_distinct_contents(sf)["n_estimate"].iloc[0])
    assert a == b


def test_customers_without_orders_non_vacuous(ray_session, tmp_path):
    """Synthetic 3-nation corpus where customers 3..5 have no recent
    order: the anti-join must return exactly those, counted per nation."""
    pd.DataFrame({
        "c_custkey": np.arange(6, dtype=np.int64),
        "c_nationkey": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64),
    }).to_parquet(f"{tmp_path}/customer.parquet", index=False)
    old = np.datetime64("1995-01-01", "us")
    new = np.datetime64("1998-01-01", "us")
    pd.DataFrame({
        "o_orderkey": np.arange(4, dtype=np.int64),
        "o_custkey": np.array([0, 1, 2, 3], dtype=np.int64),
        "o_orderdate": [new, new, new, old],   # cust 3 only has an OLD order
    }).to_parquet(f"{tmp_path}/orders.parquet", index=False)
    pd.DataFrame({
        "n_nationkey": np.arange(3, dtype=np.int64),
        "n_name": ["ALPHA", "BETA", "GAMMA"],
    }).to_parquet(f"{tmp_path}/nation.parquet", index=False)

    from vidupe_ray.pipelines.relational import customers_without_orders
    out = customers_without_orders(str(tmp_path), since="1997-06-01")
    got = dict(zip(out["n_name"], out["n_customers"].astype(int)))
    assert got == {"BETA": 1, "GAMMA": 2}


def test_containment_catches_embedded_doc(ray_session, tmp_path):
    """A doc fully embedded in a larger one has containment 1.0 but a
    Jaccard well below it — the asymmetric-measure property containment
    exists for (Broder 1997)."""
    base = " ".join("tok%d" % i for i in range(40))
    small = " ".join("tok%d" % i for i in range(12))  # prefix of base
    other = " ".join("unq%d" % i for i in range(40))
    sf = _write_docs(tmp_path, [base, small, other])
    from vidupe_ray.pipelines.textops import (containment_pairs,
                                              trigram_jaccard_pairs)
    got = containment_pairs(sf, threshold_ppm=900_000).to_pandas()
    assert len(got) == 1
    assert (int(got["a"].iloc[0]), int(got["b"].iloc[0])) == (0, 1)
    assert int(got["containment_ppm"].iloc[0]) == 1_000_000
    jac = trigram_jaccard_pairs(sf, threshold_ppm=900_000).to_pandas()
    assert len(jac) == 0  # symmetric Jaccard misses the embedding


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    """Plant one benchmark doc (id 0, bench_mod picks ids % 10 == 0) and
    one corpus doc sharing an 8-token span; only that doc is flagged and
    its hit count equals the shared 5-gram window count."""
    span = " ".join("shared%d" % i for i in range(8))
    texts = [
        span + " " + " ".join("bench%d" % i for i in range(10)),  # id 0
        " ".join("clean%d" % i for i in range(20)),               # id 1
        " ".join("pre%d" % i for i in range(6)) + " " + span,     # id 2
    ]
    sf = _write_docs(tmp_path, texts)
    from vidupe_ray.pipelines.textops import decontaminate
    got = decontaminate(sf).to_pandas()
    assert got["doc_id"].tolist() == [2]
    # an 8-token span contains exactly 4 distinct 5-grams
    assert int(got["n_hit_grams"].iloc[0]) == 4


def test_gram_ownership_first_occurrence(ray_session, tmp_path):
    """Ownership goes to the min doc_id: a verbatim copy owns nothing."""
    a = " ".join("w%d" % i for i in range(20))
    sf = _write_docs(tmp_path, [a, a, " ".join("x%d" % i for i in range(9))])
    from vidupe_ray.pipelines.textops import gram_ownership
    got = gram_ownership(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["n_novel"].tolist() == [16, 0, 5]   # 20-5+1, copy, 9-5+1
    assert got["novel_ppm"].tolist() == [1_000_000, 0, 1_000_000]


def test_repetition_score_counts(ray_session, tmp_path):
    """Duplicate bigram accounting: 'a b a b a' has 4 bigrams, 2 distinct."""
    sf = _write_docs(tmp_path, ["a b a b a", "x", "", "u v w"])
    from vidupe_ray.pipelines.textops import repetition_score
    got = repetition_score(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["n_bigrams"].tolist() == [4, 0, 0, 2]
    assert got["n_distinct_bigrams"].tolist() == [2, 0, 0, 2]
    assert got["dup_bigram_ppm"].tolist() == [500_000, 0, 0, 0]


def test_decontaminate_short_doc_at_batch_end(ray_session, tmp_path):
    """A doc with fewer than k=5 tokens at the END of the batch makes its
    shingle offset equal the hit-array length; reduceat must skip empty
    segments instead of raising IndexError (regression: round-5 review)."""
    span = " ".join("shared%d" % i for i in range(8))
    texts = [
        span + " " + " ".join("bench%d" % i for i in range(10)),  # id 0
        " ".join("pre%d" % i for i in range(6)) + " " + span,     # id 1
        "foo bar",                                                # id 2
        "",                                                       # id 3
    ]
    sf = _write_docs(tmp_path, texts)
    from vidupe_ray.pipelines.textops import decontaminate
    got = decontaminate(sf).to_pandas()
    # only the overlapping full-length doc is flagged; short/empty docs
    # neither crash nor false-positive
    assert got["doc_id"].tolist() == [1]
    assert int(got["n_hit_grams"].iloc[0]) == 4
