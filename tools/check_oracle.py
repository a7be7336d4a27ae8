"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema,
and order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [q1,q2,...]
(optional second arg: comma-separated query names to check, default all)
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import ray.data as rd
    import pyarrow as pa
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            h.update("\x00".join(map(str, s.tolist())).encode())
        else:
            h.update(np.ascontiguousarray(s.to_numpy()).tobytes())
    return h.hexdigest()[:16]


def main(sf_dir: str, only: set | None = None):
    from vidupe_ray.util import silence_benign_schema_warnings
    silence_benign_schema_warnings()
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = {**E.queries(), **getattr(E, "extra_queries", dict)()}
    sqls = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name:20s} ray error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            # no SQL oracle: verify determinism instead — a second run
            # must produce the identical value-hash
            try:
                got2 = canon(to_pandas(fn(sf_dir)))
                same = (len(got) == len(got2)
                        and value_hash(got.astype(str))
                        == value_hash(got2.astype(str)))
                status = "rows " if same else "FAIL "
                if not same:
                    failures += 1
                print(f"{status} {name:20s} rows={len(got)} "
                      f"(no oracle; deterministic={same})")
            except Exception as e:
                failures += 1
                print(f"FAIL  {name:20s} rerun error: {e}")
            continue
        try:
            want = canon(con.sql(sqls[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name:20s} sql error: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        # dtype-insensitive value compare
        gh, wh = None, None
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                g2 = got.copy()
                w2 = want.copy()
                for c in g2.columns:
                    if np.issubdtype(g2[c].dtype, np.number) or \
                       np.issubdtype(w2[c].dtype, np.number):
                        g2[c] = pd.to_numeric(g2[c]).astype("float64")
                        w2[c] = pd.to_numeric(w2[c]).astype("float64")
                    else:
                        g2[c] = g2[c].astype(str)
                        w2[c] = w2[c].astype(str)
                g2 = canon(g2)
                w2 = canon(w2)
                gh, wh = value_hash(g2), value_hash(w2)
                ok_vals = gh == wh
            except Exception as e:
                print(f"FAIL  {name:20s} compare error: {e}")
        status = "OK   " if (ok_rows and ok_cols and ok_vals) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status} {name:20s} rows={len(got)}/{len(want)} "
              f"cols_ok={ok_cols} hash={gh}/{wh}")
        if not ok_cols:
            print(f"      ray cols:  {list(got.columns)}")
            print(f"      sql cols:  {list(want.columns)}")
        if ok_rows and ok_cols and not ok_vals and len(got) < 50:
            print("      ray:", got.head(5).to_dict("records"))
            print("      sql:", want.head(5).to_dict("records"))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None)
