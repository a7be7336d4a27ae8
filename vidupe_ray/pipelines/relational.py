"""Relational join pipelines over the TPC-H-shaped tables — the classic
distributed query shapes a data-processing engine must run beside the
dedup/text operators: multi-table hash joins, join+filter+top-k, and a
range (interval) join with an equality key.

Shapes and scale plan:

- fact⋈fact joins (lineitem⋈orders) go through ``bucketed_enrich`` — ONE
  tagged-union shuffle co-partitions both sides by the join key; neither
  side is ever collected or broadcast.
- per-batch partial aggregation ALWAYS precedes the join/groupby shuffle
  (lineitem compacts ~4× on l_orderkey before any exchange).
- money is carried as integer micro-units (``floor(x·1e6)`` per row, then
  int64 sums) so results are accumulation-order independent — required
  for the DuckDB value-hash oracle and the right call at 100 TB anyway.
- the 25-row ``nation`` dimension is read inside the final (tiny) stage,
  never shuffled.

Every function takes ``sf_dir`` and returns a Ray Dataset (or small
pandas frame for top-k results); matching oracle SQL lives in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..state import bucketing as B
from ..state.joins import bucketed_enrich

_MU = 1_000_000.0


def read_table(sf_dir: str, name: str, columns=None):
    """Pruned columnar read of one TPC-H table (pandas metadata stripped
    at the read operator — see bucketing.read_parquet_clean)."""
    return B.read_parquet_clean(f"{sf_dir}/{name}.parquet",
                                columns=columns)


def _rev_mu(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    # floor(price*(1-disc)*1e6): identical double arithmetic to the SQL
    # expression (left-assoc, same IEEE ops), so per-row values match the
    # oracle bit-exactly and int64 sums are order-independent
    return np.floor(price * (1.0 - disc) * _MU).astype(np.int64)


def _lineitem_partials(sf_dir: str, ship_after=None):
    """(l_orderkey, rev_mu, n_items) partial rows: revenue floored to
    micro-units per lineitem, then pre-summed per orderkey WITHIN the
    batch — the shuffle carries ~1 row per (order, batch), not per item."""
    cols = ["l_orderkey", "l_extendedprice", "l_discount"]
    if ship_after is not None:
        cols.append("l_shipdate")

    def _partial(t: pa.Table) -> pa.Table:
        if ship_after is not None:
            t = t.filter(pc.greater(t.column("l_shipdate"),
                                    pa.scalar(ship_after)))
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        if len(ok) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_mu": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        rev = _rev_mu(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            t.column("l_discount").to_numpy(zero_copy_only=False))
        keys, inv, cnt = np.unique(ok, return_inverse=True,
                                   return_counts=True)
        # float64 bincount is exact here: per-batch per-order sums are
        # far below 2^53; the cross-batch accumulation is int64
        sums = np.bincount(inv, weights=rev.astype(np.float64))
        return pa.table({
            "l_orderkey": pa.array(keys, pa.int64()),
            "rev_mu": pa.array(sums.astype(np.int64), pa.int64()),
            "n_items": pa.array(cnt.astype(np.int64), pa.int64())})

    return read_table(sf_dir, "lineitem", cols).map_batches(
        _partial, batch_format="pyarrow")


def revenue_by_nation(sf_dir: str):
    """Lineitem revenue rolled up to the customer's nation (TPC-H
    Q5-flavored 4-table join).

    Plan: lineitem partials ⋈ orders (orderkey, bucketed) ⋈ customer
    (custkey, bucketed) → per-batch partial sums per nationkey → 25-row
    groupby → nation names mapped inside the final tiny stage.
    Output: n_name, revenue_mu, n_items.
    """
    partials = _lineitem_partials(sf_dir)
    with_cust = bucketed_enrich(
        partials, "l_orderkey",
        read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "o_orderkey", {"o_custkey": "o_custkey"})
    with_nat = bucketed_enrich(
        with_cust, "o_custkey",
        read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_custkey", {"c_nationkey": "nationkey"})

    def _partial_nat(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("nationkey", as_index=False).agg(
            revenue_mu=("rev_mu", "sum"), n_items=("n_items", "sum"))
        g["nationkey"] = g["nationkey"].astype("int64")
        g["revenue_mu"] = g["revenue_mu"].astype("int64")
        g["n_items"] = g["n_items"].astype("int64")
        return g

    from ray.data.aggregate import Sum
    per_nat = B.arrow_clean(
        with_nat.map_batches(_partial_nat, batch_format="pandas")
    ).groupby("nationkey").aggregate(
        Sum("revenue_mu", alias_name="revenue_mu"),
        Sum("n_items", alias_name="n_items"))

    nation_path = f"{sf_dir}/nation.parquet"

    def _name(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        nat = pq.read_table(nation_path,
                            columns=["n_nationkey", "n_name"]).to_pandas()
        names = dict(zip(nat["n_nationkey"].astype("int64"),
                         nat["n_name"]))
        return pd.DataFrame({
            "n_name": df["nationkey"].map(names),
            "revenue_mu": df["revenue_mu"].astype("int64"),
            "n_items": df["n_items"].astype("int64")})

    return per_nat.map_batches(_name, batch_format="pandas")


def top_orders(sf_dir: str, segment: str = "BUILDING",
               cutoff: str = "1998-01-01", k: int = 10):
    """Top-k orders by revenue for one market segment (TPC-H Q3-flavored):
    orders placed before ``cutoff``, lineitems shipped after it.

    Plan: filter each side at the read → orders ⋈ customer (bucketed) to
    resolve the segment → lineitem partials ⋈ qualifying orders
    (bucketed; non-qualifying drop as null payload) → exact per-orderkey
    sums (one bucketed grouped_map) → per-block top-k partials merged on
    the driver (O(blocks·k), never the full order table).
    Output: l_orderkey, revenue_mu, orderdate_us.
    """
    cut = np.datetime64(cutoff, "us")

    def _ofilter(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cut)))

    orders = read_table(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _ofilter, batch_format="pyarrow")
    orders_seg = bucketed_enrich(
        orders, "o_custkey",
        read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "c_custkey", {"c_mktsegment": "seg"})

    def _qual(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("seg"), pa.scalar(segment)))
        od = t.column("o_orderdate").cast(pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "orderdate_us": od})

    qual = orders_seg.map_batches(_qual, batch_format="pyarrow")

    joined = bucketed_enrich(
        _lineitem_partials(sf_dir, ship_after=cut), "l_orderkey",
        qual, "o_orderkey", {"orderdate_us": "orderdate_us"})

    def _exact(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["orderdate_us"].notna()]
        if not len(df):
            return pd.DataFrame({
                "l_orderkey": pd.Series(dtype="int64"),
                "revenue_mu": pd.Series(dtype="int64"),
                "orderdate_us": pd.Series(dtype="int64")})
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue_mu=("rev_mu", "sum"), orderdate_us=("orderdate_us",
                                                        "first"))
        g["revenue_mu"] = g["revenue_mu"].astype("int64")
        g["orderdate_us"] = g["orderdate_us"].astype("int64")
        return g

    per_order = B.grouped_map(joined, "l_orderkey", B.bucket_of_ints,
                              _exact, batch_format="pandas")

    def _block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_mu", "l_orderkey"],
                              ascending=[False, True]).head(k)

    top = (per_order.map_batches(_block_topk, batch_format="pandas")
           .to_pandas()
           .sort_values(["revenue_mu", "l_orderkey"],
                        ascending=[False, True]).head(k))
    return top.reset_index(drop=True)


def _count_upto(uid_v: np.ndarray, ts_v: np.ndarray, uid_q: np.ndarray,
                ts_q: np.ndarray, inclusive: bool) -> np.ndarray:
    """Per query q: count of (uid_v == uid_q[q]) rows with ts_v <= ts_q[q]
    (inclusive) or < (exclusive).  Pure merge arithmetic — one lexsort of
    the combined arrays, no composite-key overflow, no per-row loop.
    ``(uid_v, ts_v)`` must already be lex-sorted."""
    nv, nq = len(uid_v), len(uid_q)
    uid = np.concatenate([uid_v, uid_q])
    ts = np.concatenate([ts_v, ts_q])
    # at equal (uid, ts): inclusive → view rows sort first (counted);
    # exclusive → query rows sort first (tie not counted)
    flag = np.concatenate([np.zeros(nv, np.int8), np.ones(nq, np.int8)])
    if not inclusive:
        flag = 1 - flag
    order = np.lexsort((flag, ts, uid))
    is_view = order < nv
    cum = np.cumsum(is_view)
    pos_of = np.empty(nv + nq, np.int64)
    pos_of[order] = np.arange(nv + nq)
    qpos = pos_of[nv:]
    total_upto = cum[qpos] - is_view[qpos]
    # subtract views belonging to earlier uids (uid_v is sorted)
    base = np.searchsorted(uid_v, uid_q, side="left")
    return total_upto - base


def interval_join(sf_dir: str, window_s: int = 3600,
                  left_type: str = "purchase", right_type: str = "view"):
    """Range join with an equality key: for every ``left_type`` event,
    the number of ``right_type`` events by the SAME user in
    ``[ts − window, ts]`` (inclusive both ends; left outer — zero-view
    purchases are kept).

    Composition: bucket by user_id (one slim shuffle), lexsort within the
    bucket, resolve the range predicate with two vectorized merge-counts
    (≤ ts and < ts − window) — the documented pattern for operators Ray
    Data lacks natively.  Output: purchase_id, user_id, n_views.
    """
    from .events import read_events
    win = np.int64(window_s) * 1_000_000

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        lm, rm = et == left_type, et == right_type
        if not lm.any():
            return pd.DataFrame({
                "purchase_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "n_views": pd.Series(dtype="int64")})
        v_order = np.lexsort((ts[rm], uid[rm]))
        uid_v, ts_v = uid[rm][v_order], ts[rm][v_order]
        uid_q, ts_q, eid_q = uid[lm], ts[lm], eid[lm]
        hi = _count_upto(uid_v, ts_v, uid_q, ts_q, inclusive=True)
        lo = _count_upto(uid_v, ts_v, uid_q, ts_q - win, inclusive=False)
        return pd.DataFrame({"purchase_id": eid_q, "user_id": uid_q,
                             "n_views": (hi - lo).astype(np.int64)})

    ev = read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _count,
                         batch_format="pandas")


def pricing_summary(sf_dir: str):
    """Per (returnflag, linestatus) pricing summary (TPC-H Q1 flavor):
    sums of quantity / price / discounted price and row counts, shipped
    on-or-before the cutoff.  Pure scan + partial aggregation — the
    shuffle carries one row per (flag, status, batch), never a lineitem.
    Money in integer micro-units per ROW (order-independent sums).
    Output: l_returnflag, l_linestatus, sum_qty, sum_base_mu,
    sum_disc_mu, n_rows.
    """
    from ray.data.aggregate import Sum
    cut = np.datetime64("1998-09-02", "us")

    def _partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cut)))
        if t.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.int64()),
                "sum_base_mu": pa.array([], pa.int64()),
                "sum_disc_mu": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64())})
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_numpy(
                zero_copy_only=False),
            "l_linestatus": t.column("l_linestatus").to_numpy(
                zero_copy_only=False),
            "qty": t.column("l_quantity").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "base_mu": np.floor(price * _MU).astype(np.int64),
            "disc_mu": _rev_mu(price, disc)})
        g = df.groupby(["l_returnflag", "l_linestatus"],
                       as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_mu=("base_mu", "sum"),
            sum_disc_mu=("disc_mu", "sum"), n_rows=("qty", "size"))
        for c in ("sum_qty", "sum_base_mu", "sum_disc_mu", "n_rows"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = read_table(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"]).map_batches(
        _partial, batch_format="pyarrow")
    return parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_mu", alias_name="sum_base_mu"),
        Sum("sum_disc_mu", alias_name="sum_disc_mu"),
        Sum("n_rows", alias_name="n_rows"))


def part_type_sales(sf_dir: str):
    """Discounted revenue per part type — fact⋈dimension join where the
    dimension (part) is too big to assume broadcastable at 100 TB: per-
    batch partial sums per l_partkey compact the fact stream, ONE
    bucketed enrich attaches p_type, then per-batch partials feed the
    tiny per-type groupby.  Output: p_type, revenue_mu, n_items.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "rev_mu": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        rev = _rev_mu(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            t.column("l_discount").to_numpy(zero_copy_only=False))
        keys, inv, cnt = np.unique(pk, return_inverse=True,
                                   return_counts=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64))
        return pa.table({
            "l_partkey": pa.array(keys, pa.int64()),
            "rev_mu": pa.array(sums.astype(np.int64), pa.int64()),
            "n_items": pa.array(cnt.astype(np.int64), pa.int64())})

    parts = read_table(sf_dir, "lineitem",
                       ["l_partkey", "l_extendedprice",
                        "l_discount"]).map_batches(
        _partial, batch_format="pyarrow")
    with_type = bucketed_enrich(
        parts, "l_partkey",
        read_table(sf_dir, "part", ["p_partkey", "p_type"]),
        "p_partkey", {"p_type": "p_type"})

    def _per_type(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_type", as_index=False).agg(
            revenue_mu=("rev_mu", "sum"), n_items=("n_items", "sum"))
        g["revenue_mu"] = g["revenue_mu"].astype("int64")
        g["n_items"] = g["n_items"].astype("int64")
        return g

    return B.arrow_clean(
        with_type.map_batches(_per_type, batch_format="pandas")
    ).groupby("p_type").aggregate(
        Sum("revenue_mu", alias_name="revenue_mu"),
        Sum("n_items", alias_name="n_items"))


def supplier_region_revenue(sf_dir: str):
    """Discounted revenue per supplier REGION — the snowflake chain
    lineitem ⋈ supplier ⋈ nation ⋈ region.  The fact stream compacts per
    suppkey before its one bucketed enrich against supplier; the two
    tiny dimensions (nation, region) never shuffle — they are read inside
    the final ≤|nations|-row stage and applied as dict maps.
    Output: r_name, revenue_mu.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(sk) == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "rev_mu": pa.array([], pa.int64())})
        rev = _rev_mu(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            t.column("l_discount").to_numpy(zero_copy_only=False))
        keys, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64))
        return pa.table({
            "l_suppkey": pa.array(keys, pa.int64()),
            "rev_mu": pa.array(sums.astype(np.int64), pa.int64())})

    parts = read_table(sf_dir, "lineitem",
                       ["l_suppkey", "l_extendedprice",
                        "l_discount"]).map_batches(
        _partial, batch_format="pyarrow")
    with_nat = bucketed_enrich(
        parts, "l_suppkey",
        read_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", {"s_nationkey": "nationkey"})

    def _per_nat(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("nationkey", as_index=False).agg(
            revenue_mu=("rev_mu", "sum"))
        g["nationkey"] = g["nationkey"].astype("int64")
        g["revenue_mu"] = g["revenue_mu"].astype("int64")
        return g

    per_nat = B.arrow_clean(
        with_nat.map_batches(_per_nat, batch_format="pandas")
    ).groupby("nationkey").aggregate(
        Sum("revenue_mu", alias_name="revenue_mu"))

    nat_path = f"{sf_dir}/nation.parquet"
    reg_path = f"{sf_dir}/region.parquet"

    def _name(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        nat = pq.read_table(nat_path).to_pandas()
        reg = pq.read_table(reg_path).to_pandas()
        n2r = dict(zip(nat["n_nationkey"].astype("int64"),
                       nat["n_regionkey"].astype("int64")))
        r2n = dict(zip(reg["r_regionkey"].astype("int64"), reg["r_name"]))
        df = df.copy()
        df["r_name"] = df["nationkey"].map(n2r).map(r2n)
        g = df.groupby("r_name", as_index=False).agg(
            revenue_mu=("revenue_mu", "sum"))
        g["revenue_mu"] = g["revenue_mu"].astype("int64")
        return g

    # the per-nation aggregate is <= |nations| rows: collapse to one
    # block so the region rollup happens in a single final task
    return per_nat.repartition(1).map_batches(_name,
                                              batch_format="pandas")


def customer_order_stats(sf_dir: str):
    """Per-customer order count and lifetime spend — the LEFT OUTER join
    shape: every customer appears exactly once, customers with no orders
    carry zeros (the join's null path, exercised distributed).

    Plan: per-batch partial (custkey, n, spend_mu) sums compact the
    orders stream BEFORE any exchange, one bucketed grouped_map makes
    them exact per custkey, and ``bucketed_enrich`` left-joins the
    partials onto the customer table (misses surface as nulls → zeros).
    Spend is floored to integer micro-units per ORDER first, so sums are
    accumulation-order independent on both engines.
    Output: c_custkey, n_orders, spend_mu (all int64).
    """
    def _partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        if len(ck) == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "spend_mu": pa.array([], pa.int64())})
        mu = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False)
            * _MU).astype(np.int64)
        keys, inv, cnt = np.unique(ck, return_inverse=True,
                                   return_counts=True)
        # float64 bincount exact: per-batch per-customer sums << 2^53
        sums = np.bincount(inv, weights=mu.astype(np.float64))
        return pa.table({
            "o_custkey": pa.array(keys, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "spend_mu": pa.array(sums.astype(np.int64), pa.int64())})

    parts = read_table(sf_dir, "orders",
                       ["o_custkey", "o_totalprice"]).map_batches(
        _partial, batch_format="pyarrow")

    def _exact(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            n_orders=("n", "sum"), spend_mu=("spend_mu", "sum"))
        return g.astype({"o_custkey": "int64", "n_orders": "int64",
                         "spend_mu": "int64"})

    per_cust = B.grouped_map(parts, "o_custkey", B.bucket_of_ints,
                             _exact, batch_format="pandas")
    joined = bucketed_enrich(
        read_table(sf_dir, "customer", ["c_custkey"]), "c_custkey",
        per_cust, "o_custkey",
        {"n_orders": "n_orders", "spend_mu": "spend_mu"})

    def _fill(t: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "n_orders": pc.coalesce(t.column("n_orders"), z),
            "spend_mu": pc.coalesce(t.column("spend_mu"), z)})

    return joined.map_batches(_fill, batch_format="pyarrow")


def orders_rollup(sf_dir: str):
    """Order counts and value totaled per (year, priority), per year, and
    grand-total — the GROUP BY ROLLUP shape.  Subtotal keys use sentinels
    (o_year=-1, priority='ALL') instead of SQL NULLs so the value-hash
    oracle compares cleanly.

    Plan: per-batch partial (year, priority) cells (the combiner), one
    tiny groupby over the |years|x|priorities| cell table, then the three
    rollup levels expand from those cells in the final map stage — the
    raw order stream is scanned once and never shuffled.
    Output: o_year, priority, n_orders, total_mu.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "priority": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "mu": pa.array([], pa.int64())})
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = (ts.astype("datetime64[Y]").astype(np.int64)
                + 1970).astype(np.int64)
        mu = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False)
            * _MU).astype(np.int64)
        df = pd.DataFrame({
            "o_year": year,
            "priority": t.column("o_orderpriority").to_numpy(
                zero_copy_only=False),
            "mu": mu})
        g = df.groupby(["o_year", "priority"], as_index=False).agg(
            n=("mu", "size"), mu=("mu", "sum"))
        return pa.table({
            "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
            "priority": pa.array(g["priority"].astype(str), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "mu": pa.array(g["mu"].to_numpy(np.int64), pa.int64())})

    cells = (read_table(sf_dir, "orders",
                        ["o_orderdate", "o_totalprice", "o_orderpriority"])
             .map_batches(_partial, batch_format="pyarrow")
             .groupby(["o_year", "priority"])
             .aggregate(Sum("n", alias_name="n_orders"),
                        Sum("mu", alias_name="total_mu")))

    def _rollup(df: pd.DataFrame) -> pd.DataFrame:
        base = df.astype({"o_year": "int64", "n_orders": "int64",
                          "total_mu": "int64"})[
            ["o_year", "priority", "n_orders", "total_mu"]]
        per_year = base.groupby("o_year", as_index=False).agg(
            n_orders=("n_orders", "sum"), total_mu=("total_mu", "sum"))
        per_year["priority"] = "ALL"
        total = pd.DataFrame({
            "o_year": np.array([-1], np.int64), "priority": ["ALL"],
            "n_orders": np.array([base["n_orders"].sum()], np.int64),
            "total_mu": np.array([base["total_mu"].sum()], np.int64)})
        out = pd.concat([base, per_year[base.columns.tolist()], total],
                        ignore_index=True)
        return out.astype({"o_year": "int64", "n_orders": "int64",
                           "total_mu": "int64"})

    # the cell table is |years| x |priorities| rows — collapse to ONE
    # block so the three rollup levels expand in a single final task
    return B.arrow_clean(cells).repartition(1).map_batches(
        _rollup, batch_format="pandas")


def customers_without_orders(sf_dir: str, since: str = "1997-06-01"):
    """Customers with no order at-or-after ``since``, counted per nation —
    the anti-join shape (TPC-H Q22 flavor, churn variant: anti-joining
    against ALL orders is vacuous on a corpus where every customer has
    ordered at least once, so the key set is the recent-orders slice).

    Plan: the recent-order custkeys become sharded key refs (distinct
    int64 shards built by two task waves, never on the driver); the
    customer table is anti-filtered IN PLACE against them (no shuffle of
    the customer rows), then per-batch partial counts per nationkey feed
    a 25-row groupby; nation names map inside the final tiny stage.
    Output: n_name, n_customers.
    """
    from ..config import DEFAULT_CONFIG
    from ..state.joins import sharded_key_refs, filter_by_key_shards
    from ray.data.aggregate import Sum

    cfg = DEFAULT_CONFIG
    cut = np.datetime64(since, "us")

    def _recent(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("o_orderdate"),
                                         pa.scalar(cut)))

    okeys = read_table(sf_dir, "orders",
                       ["o_custkey", "o_orderdate"]).map_batches(
        _recent, batch_format="pyarrow").select_columns(["o_custkey"])
    refs = sharded_key_refs(okeys, "o_custkey", cfg.join_buckets)
    no_orders = filter_by_key_shards(
        read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_custkey", refs, invert=True)

    def _partial(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(nk, return_counts=True)
        return pa.table({
            "nationkey": pa.array(keys.astype(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    per_nat = no_orders.map_batches(
        _partial, batch_format="pyarrow").groupby("nationkey").aggregate(
        Sum("n", alias_name="n_customers"))

    # the aggregate is <= |nations| rows; collect and name driver-side —
    # an all-orders corpus yields an EMPTY aggregate whose Dataset loses
    # the schema, so the typed empty frame is built explicitly
    df = per_nat.to_pandas()
    if df.empty:
        return pd.DataFrame({"n_name": pd.Series(dtype=object),
                             "n_customers": pd.Series(dtype="int64")})
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    return pd.DataFrame({
        "n_name": df["nationkey"].map(names),
        "n_customers": df["n_customers"].astype("int64")})
