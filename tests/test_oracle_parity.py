"""Fast in-pytest replica of the driver's DuckDB correctness gate on a
subset of SQL-checked queries at sf0.001 (the full gate lives in
tools/check_oracle.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SUBSET = ["doc_stats", "exact_dedup", "token_stats", "quality",
          "heavy_hitters", "tumbling_window", "hopping_window",
          "top_per_lang", "sample_per_lang"]


@pytest.fixture(scope="module")
def harness(ray_session):
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return E, con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(harness, name):
    E, con = harness
    got = E.queries()[name](SF)
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
