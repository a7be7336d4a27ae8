"""Fast in-pytest replica of the driver's DuckDB correctness gate on a
subset of SQL-checked queries at sf0.001 (the full gate lives in
tools/check_oracle.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SUBSET = ["doc_stats", "exact_dedup", "token_stats", "doc_fingerprints",
          "quality", "heavy_hitters", "tumbling_window", "hopping_window",
          "top_per_lang", "sample_per_lang", "asof_join", "interval_join",
          "revenue_by_nation", "top_orders", "daily_active_users",
          "user_event_gaps", "rolling_value_sum", "event_type_pivot",
          "distinct_contents", "customers_without_orders",
          "customer_order_stats", "orders_rollup", "embedding_clusters",
          "pricing_summary", "part_type_sales", "supplier_region_revenue",
          "tfidf_top_terms", "dup_rate_by_source", "engaged_users",
          "containment_pairs", "repetition_score", "decontaminate",
          "gram_ownership"]


@pytest.fixture(scope="module")
def harness(ray_session):
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "orders", "lineitem",
              "customer", "nation", "part", "supplier", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return E, con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(harness, name):
    E, con = harness
    got = {**E.queries(), **E.extra_queries()}[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(E.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    assert len(g) == len(w)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if np.issubdtype(gv.dtype, np.number) or \
           np.issubdtype(wv.dtype, np.number):
            np.testing.assert_array_equal(
                pd.to_numeric(gv).astype("float64").to_numpy(),
                pd.to_numeric(wv).astype("float64").to_numpy(), err_msg=c)
        else:
            assert (gv.astype(str) == wv.astype(str)).all(), c


def test_dedup_pairs_exact_with_planted_dups(harness, tmp_path):
    """The testdata corpora are dup-free, so at driver scale
    dedup_pairs_exact is a negative control (empty == empty).  Make it
    non-vacuous here: plant exact duplicate docs and check the full-chain
    pair expansion equals DuckDB's same-content self-join."""
    E, _ = harness
    rng = np.random.RandomState(3)
    texts = ["word%d alpha beta gamma delta epsilon zeta eta theta "
             "iota kappa lambda mu nu xi omicron pi rho sigma tau %d"
             % (i, i) for i in range(40)]
    # duplicate groups: {0,40,41}, {1,42}, rest singletons
    texts += [texts[0], texts[0], texts[1]]
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)

    got = E.extra_queries()["dedup_pairs_exact"](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.sql(E.oracle_sql()["dedup_pairs_exact"]).fetchdf()
    gs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    ws = set(zip(want["a"].astype(int), want["b"].astype(int)))
    assert ws == {(0, 40), (0, 41), (40, 41), (1, 42)}
    assert gs == ws
    # the cluster variant on the same planted dups: the multi-attribute
    # canonical ranking (tolerance -> pseudo-mtime -> doc_id) must match
    # DuckDB row-for-row, including is_canonical inside dup groups
    gc = E.queries()["dedup_clusters_exact"](sf)
    gc = gc.to_pandas() if hasattr(gc, "to_pandas") else gc
    wc = con.sql(E.oracle_sql()["dedup_clusters_exact"]).fetchdf()
    g2 = gc.sort_values("doc_id").reset_index(drop=True)
    w2 = wc.sort_values("doc_id").reset_index(drop=True)
    for c in ["doc_id", "cluster_id", "cluster_size"]:
        np.testing.assert_array_equal(g2[c].astype(int), w2[c].astype(int))
    np.testing.assert_array_equal(g2["is_canonical"].astype(bool),
                                  w2["is_canonical"].astype(bool))
    # non-vacuous: dup groups exist and exactly one canonical per cluster
    assert (g2.groupby("cluster_id")["is_canonical"].sum() == 1).all()
    assert (g2["cluster_size"] > 1).any()


def test_bpe_token_stats_diverges_from_whitespace(harness, tmp_path):
    """The driver corpora are punctuation-free word salad, where BPE-ish
    and whitespace token counts coincide.  Make the BPE regex non-vacuous
    here: punctuation, digit runs, and glued alnum must SPLIT (so the
    count exceeds the whitespace count) and still match DuckDB's RE2
    evaluation of the same pattern exactly.  (BPE counts ride the merged
    token_stats query since round 4.)"""
    E, _ = harness
    texts = [
        "Hello, world! It's 2026-08-17 — v2.49.2 of ray[data].",
        "abc123def 456  ,,;;  trailing space ",
        "no_punct plain words only",
        None,
        "",
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en", "en", "de", "de", "en"],
        "source": ["t"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)

    got = E.queries()["token_stats"](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.sql(E.oracle_sql()["token_stats"]).fetchdf()
    g = got.sort_values("lang").reset_index(drop=True)
    w = want.sort_values("lang").reset_index(drop=True)
    np.testing.assert_array_equal(g["sum_bpe_tokens"].to_numpy(),
                                  w["sum_bpe_tokens"].to_numpy())
    np.testing.assert_array_equal(g["n_docs"].to_numpy(),
                                  w["n_docs"].to_numpy())
    # divergence from whitespace tokenization: doc 0 has 9 ws tokens but
    # far more BPE tokens (punctuation/digit splits)
    en = int(g.loc[g["lang"] == "en", "sum_bpe_tokens"].iloc[0])
    ws_count = sum(len((t or "").split()) for t, l in zip(texts, df["lang"])
                   if l == "en")
    assert en > ws_count


def _crafted_sf(tmp_path, texts, langs):
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": ["t"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return sf, con


def test_top_tokens_limit_bites_with_boundary_ties(harness, tmp_path):
    """The driver corpora have a ~31-token vocabulary, so LIMIT 50 never
    truncates there.  Here: 80 distinct tokens, many sharing the same
    count right at the k boundary — the (cnt desc, token asc) tie-break
    must make Ray's sort().limit() pick exactly SQL's rows."""
    E, _ = harness
    # tok00..tok39 appear (40-i) times => distinct counts; tok40..tok79
    # all appear exactly 3 times => a 40-way tie spanning the k=50 cut
    texts = []
    for i in range(40):
        texts.append(" ".join([f"tok{i:02d}"] * (40 - i)))
    for i in range(40, 80):
        texts.append(" ".join([f"tok{i:02d}"] * 3))
    texts += [None, "", "   "]
    sf, con = _crafted_sf(tmp_path, texts, ["en"] * len(texts))

    got = E.queries()["top_tokens"](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(E.oracle_sql()["top_tokens"]).fetchdf()
    assert len(got) == 50 and len(want) == 50
    g = got.sort_values(["cnt", "token"],
                        ascending=[False, True]).reset_index(drop=True)
    assert list(g["token"]) == list(want["token"])
    assert list(g["cnt"].astype(int)) == list(want["cnt"].astype(int))


def test_doc_embedding_join_missing_keys(harness, tmp_path):
    """documents ⋈ embeddings where some docs have NO embedding row: the
    bucketed enrich must emit nulls exactly where SQL LEFT JOIN does, and
    integer norms must match where present."""
    E, _ = harness
    sf, con = _crafted_sf(tmp_path, ["alpha beta", "gamma", "delta", "eps"],
                          ["en", "en", "de", "fr"])
    emb = pd.DataFrame({
        "vec_id": np.array([0, 2], dtype=np.int64),     # docs 1,3 missing
        "embedding": [np.array([0.5, -1.25, 2.0], dtype=np.float32),
                      np.array([1.0, 0.0, -0.001], dtype=np.float32)],
        "label": np.array([7, 9], dtype=np.int32),
    })
    emb.to_parquet(f"{sf}/embeddings.parquet", index=False)
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")

    got = E.queries()["doc_embedding_join"](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(E.oracle_sql()["doc_embedding_join"]).fetchdf()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert len(g) == 4 and len(w) == 4
    for c in ["label", "norm_sq_fp"]:
        gv = pd.to_numeric(g[c]).astype("float64")
        wv = pd.to_numeric(w[c]).astype("float64")
        assert (gv.isna() == wv.isna()).all(), c
        np.testing.assert_array_equal(gv.dropna().to_numpy(),
                                      wv.dropna().to_numpy(), err_msg=c)
    # doc 0: floor-quantized milli-units 500, -1250, 2000
    assert int(g.loc[0, "norm_sq_fp"]) == 500**2 + 1250**2 + 2000**2
    # doc 2: float32(-0.001) = -0.00100000004749...; x1000 floors to -2
    # (NOT -1) — the float32->double promotion happens identically in
    # numpy and DuckDB, which is exactly what this pin checks
    assert int(g.loc[g["doc_id"] == 2, "norm_sq_fp"].iloc[0]) == \
        1000**2 + 0 + 4


def test_length_quantiles_small_groups(harness, tmp_path):
    """Histogram-quantile parity with quantile_disc on degenerate group
    sizes: a 1-doc lang, a 2-doc lang, and a lang with repeated values."""
    E, _ = harness
    texts = (["x" * n for n in [7]] +            # de: single doc
             ["x" * n for n in [3, 9]] +         # fr: two docs
             ["x" * n for n in [5, 5, 5, 11, 2, 8, 8]])   # en: repeats
    langs = ["de"] + ["fr"] * 2 + ["en"] * 7
    sf, con = _crafted_sf(tmp_path, texts, langs)

    got = E.queries()["length_quantiles"](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(E.oracle_sql()["length_quantiles"]).fetchdf()
    g = got.sort_values("lang").reset_index(drop=True)
    w = want.sort_values("lang").reset_index(drop=True)
    for c in ["n_docs", "p50_chars", "p90_chars", "p99_chars"]:
        np.testing.assert_array_equal(g[c].to_numpy(np.int64),
                                      w[c].to_numpy(np.int64), err_msg=c)


def test_signatures_and_fingerprints_oracle_edges(harness, tmp_path):
    """VERDICT r3 #7 queries on crafted edges the driver corpus lacks:
    empty / whitespace-only docs (rejected from signatures), docs below
    the shingle window (single truncated winnowing window, low_content),
    and exact duplicates (signatures exist for the min-doc_id winner
    only)."""
    E, _ = harness
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon",   # 20 tokens
        "one two three four five six seven",                  # 7 = k
        "short doc",                                          # < k tokens
        "",                                                   # empty
        "   \t  ",                                            # ws-only
        None,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon",   # dup of 0
    ]
    sf, con = _crafted_sf(tmp_path, texts,
                          ["en"] * len(texts))
    for name in ("signatures", "doc_fingerprints"):
        got = E.queries()[name](sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(E.oracle_sql()[name]).fetchdf()
        g = got[sorted(got.columns)].sort_values(
            sorted(got.columns)).reset_index(drop=True)
        w = want[sorted(want.columns)].sort_values(
            sorted(want.columns)).reset_index(drop=True)
        assert len(g) == len(w), name
        for c in g.columns:
            np.testing.assert_array_equal(
                pd.to_numeric(g[c], errors="ignore"),
                pd.to_numeric(w[c], errors="ignore"), err_msg=f"{name}.{c}")
    # semantic spot checks
    sig = E.queries()["signatures"](sf).to_pandas()
    assert 6 not in set(sig["doc_id"])          # dup loser: no signature
    assert set(sig.loc[sig["low_content"], "doc_id"]) >= {1, 2}
    fp = E.queries()["doc_fingerprints"](sf).to_pandas().set_index("doc_id")
    assert fp.loc[2, "n_fingerprints"] == 0     # < k tokens: no shingle
    assert fp.loc[1, "n_fingerprints"] == 1     # exactly one shingle
    assert fp.loc[0, "n_fingerprints"] >= 1


def test_driver_window_is_exactly_fifty():
    """The driver records only the FIRST 50 queries() entries (round 3
    dropped entry 51 silently).  Adding operator #51 here instead of
    extra_queries() would silently push a shipped operator out of the
    recording window — fail loudly instead."""
    import __ray_entry__ as E
    assert len(E.queries()) == 50, (
        "queries() must stay at exactly 50 entries; put overflow in "
        "extra_queries() (see its docstring)")
    # every SQL-checked name must resolve: oracle keys ⊆ merged queries
    merged = {**E.queries(), **E.extra_queries()}
    unknown = set(E.oracle_sql()) - set(merged)
    assert not unknown, f"oracle_sql keys without a query: {unknown}"
