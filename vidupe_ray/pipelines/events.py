"""Stream-shaped operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming concepts (SURVEY.md §2.10) — these are the
training-data-pipeline extras: the input is treated as an ordered,
partitioned log (ray_guide.md streaming section): partition by key, sort
by ts within partition, window with pandas inside the group.  Oracle SQL
expresses the same windows with ``GROUP BY floor(epoch/size)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_EVENTS = "{sf}/events.parquet"
_WINDOW_S = 3600


def read_events(sf_dir: str, columns=None):
    # source-level pandas-metadata strip (see textops.read_documents)
    from ..state.bucketing import read_parquet_clean
    return read_parquet_clean(_EVENTS.format(sf=sf_dir), columns=columns)


def tumbling_window_stats(sf_dir: str, window_s: int = _WINDOW_S):
    """Per (event_type, hour window): count and floor-scaled value sum.

    Pre-aggregated per batch (partial/combiner) before the tiny groupby —
    the shuffle carries one row per (type, window, batch).
    """
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # datetime64 unit varies by source (parquet loads as [us]);
        # normalize to whole seconds explicitly
        epoch = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        win = pd.Series(epoch // window_s, index=df.index)
        g = pd.DataFrame({"event_type": df["event_type"], "win": win,
                          "value": df["value"]})
        agg = g.groupby(["event_type", "win"], as_index=False).agg(
            n_events=("value", "size"), value_sum=("value", "sum"))
        return agg

    from ray.data.aggregate import Sum
    from ..state.bucketing import arrow_clean
    partial = read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        _partial, batch_format="pandas")
    out = arrow_clean(partial).groupby(["event_type", "win"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_sum", alias_name="value_sum_raw"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # ROUND-scaled int for float-hash parity with the SQL oracle:
        # the inputs have 2 decimals, so sum*100 always lands within 1e-9
        # of an integer — floor would coin-flip on summation order, round
        # is stable on both sides
        df["value_x100"] = np.rint(
            df["value_sum_raw"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        df["n_events"] = df["n_events"].astype("int64")
        return df[["event_type", "win", "n_events", "value_x100"]]

    return out.map_batches(_finish, batch_format="pandas")


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows per user: a new session starts after a > gap_s
    silence.  Partition by user_id (bucketed), sort by ts inside the
    bucket, vectorized gap detection — the ordered-log pattern.

    Output: user_id, session_idx (0-based per user), n_events,
    duration_s (floor int).
    """
    from ..state import bucketing as B

    def _sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable")
        epoch = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], epoch[1:] - epoch[:-1]])
        new_sess = new_user | (gap > gap_s)
        sess_id = np.cumsum(new_sess) - 1
        g = pd.DataFrame({"user_id": uid, "sess": sess_id, "epoch": epoch})
        agg = g.groupby(["user_id", "sess"], as_index=False).agg(
            n_events=("epoch", "size"), start=("epoch", "min"),
            end=("epoch", "max"))
        agg = agg.sort_values(["user_id", "start"], kind="stable")
        agg["session_idx"] = agg.groupby("user_id").cumcount()
        agg["duration_s"] = (agg["end"] - agg["start"]).astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg[["user_id", "session_idx", "n_events", "duration_s"]]

    ev = read_events(sf_dir, ["ts", "user_id"])
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _sessions,
                         batch_format="pandas")


def heavy_hitters(sf_dir: str, k: int = 10):
    """Top-k users by event count — partial counts per batch, tiny
    groupby, then PER-BLOCK top-k partials before the driver merge
    (VERDICT r2 #4: never ``to_pandas()`` the full per-user count table).

    After the groupby each user appears in exactly one row, so taking
    top-k within every output block and merging the ``blocks x k`` rows
    on the driver is exact — the mergeable-partial pattern of
    ``textops.top_per_lang``.  Driver footprint: O(blocks x k), not
    O(|users|)."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            n=("user_id", "size"))

    def _block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "user_id"],
                            ascending=[False, True]).head(k)
        df = df.copy()
        df["n"] = df["n"].astype("int64")
        return df

    from ray.data.aggregate import Sum
    from ..state.bucketing import arrow_clean
    counts = (arrow_clean(read_events(sf_dir, ["user_id"])
                          .map_batches(_partial, batch_format="pandas"))
              .groupby("user_id").aggregate(Sum("n", alias_name="n")))
    partial_top = counts.map_batches(_block_topk, batch_format="pandas")
    top = partial_top.to_pandas().sort_values(
        ["n", "user_id"], ascending=[False, True]).head(k)
    top["n"] = top["n"].astype("int64")
    return top.reset_index(drop=True)


def hopping_window_stats(sf_dir: str, window_s: int = 3600,
                         hop_s: int = 900):
    """Overlapping (hopping) windows: every event lands in
    ``window_s / hop_s`` windows (4 by default).  The fan-out is done
    vectorized inside the partial aggregate — the shuffle carries one row
    per (type, window, batch), never the 4x event stream.
    """
    nh = window_s // hop_s

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        base = epoch // hop_s
        ws = np.concatenate([(base - i) * hop_s for i in range(nh)])
        g = pd.DataFrame({
            "event_type": np.tile(df["event_type"].to_numpy(), nh),
            "window_start": ws,
            "value": np.tile(df["value"].to_numpy(np.float64), nh)})
        return g.groupby(["event_type", "window_start"],
                         as_index=False).agg(
            n_events=("value", "size"), value_sum=("value", "sum"))

    from ray.data.aggregate import Sum
    from ..state.bucketing import arrow_clean
    partial = read_events(sf_dir, ["ts", "event_type", "value"]) \
        .map_batches(_partial, batch_format="pandas")
    out = arrow_clean(partial).groupby(
        ["event_type", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_sum", alias_name="value_sum_raw"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_x100"] = np.rint(
            df["value_sum_raw"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        df["n_events"] = df["n_events"].astype("int64")
        return df[["event_type", "window_start", "n_events", "value_x100"]]

    return out.map_batches(_finish, batch_format="pandas")


def daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per day — the grouped-distinct shape.

    Two-level plan so the shuffle never carries the raw event stream:
    per-batch (day, user) dedup first (the partial), then ONE bucketed
    shuffle on user_id — each user's rows land in exactly one task, so
    per-bucket distinct-counts per day sum to the exact global answer
    (disjoint user sets).  Output: day (epoch days, int64), n_users.
    """
    from ray.data.aggregate import Sum
    from ..state import bucketing as B

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        g = pd.DataFrame({"day": epoch // 86400,
                          "user_id": df["user_id"].to_numpy(np.int64)})
        return g.drop_duplicates()

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("day", as_index=False).agg(
            n_users=("user_id", "size"))
        g["day"] = g["day"].astype("int64")
        g["n_users"] = g["n_users"].astype("int64")
        return g

    ev = read_events(sf_dir, ["ts", "user_id"]).map_batches(
        _partial, batch_format="pandas")
    per_bucket = B.grouped_map(ev, "user_id", B.bucket_of_ints, _bucket,
                               batch_format="pandas")
    out = per_bucket.groupby("day").aggregate(
        Sum("n_users", alias_name="n_users"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_users"] = df["n_users"].astype("int64")
        df["day"] = df["day"].astype("int64")
        return df[["day", "n_users"]]

    return out.map_batches(_finish, batch_format="pandas")


def user_event_gaps(sf_dir: str):
    """Per-user inter-event gap stats — the LAG window shape: gap =
    ts − previous ts of the SAME user in (ts, event_id) order.  Partition
    by user (one slim bucketed shuffle), lexsort inside the bucket,
    vectorized diff with a segment reset — no per-user loop.

    Users with a single event have no gaps and drop (matches the SQL
    ``WHERE gap IS NOT NULL``).  Output: user_id, n_gaps, sum_gap_us,
    max_gap_us (all int64).
    """
    from ..state import bucketing as B

    def _gaps(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        ts, uid = ts[order], uid[order]
        same = uid[1:] == uid[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        owner = uid[1:][same]
        if len(owner) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_gaps": pd.Series(dtype="int64"),
                "sum_gap_us": pd.Series(dtype="int64"),
                "max_gap_us": pd.Series(dtype="int64")})
        g = pd.DataFrame({"user_id": owner, "gap": gap}).groupby(
            "user_id", as_index=False).agg(
            n_gaps=("gap", "size"), sum_gap_us=("gap", "sum"),
            max_gap_us=("gap", "max"))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g

    ev = read_events(sf_dir, ["event_id", "ts", "user_id"])
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _gaps,
                         batch_format="pandas")


def rolling_value_sum(sf_dir: str, window: int = 3):
    """Per-event rolling sum of the last ``window`` values of the same
    user in (ts, event_id) order — the ROWS-frame window aggregate.
    Values are scaled to cents FIRST (``rint(value·100)`` int64, exact
    for 2-decimal inputs) so the rolling sums are integer and
    accumulation-order independent on both sides of the oracle.

    Output: event_id, user_id, roll_x100 (int64).
    """
    from ..state import bucketing as B

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v100 = np.rint(df["value"].to_numpy(np.float64) * 100.0
                       ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, v100 = uid[order], eid[order], v100[order]
        roll = v100.copy()
        # rows are uid-sorted, so uid[j] == uid[j-i] implies the whole
        # run between them is the same user — one comparison per depth
        for i in range(1, window):
            roll[i:] += np.where(uid[i:] == uid[:-i], v100[:-i], 0)
        return pd.DataFrame({"event_id": eid, "user_id": uid,
                             "roll_x100": roll})

    ev = read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _roll,
                         batch_format="pandas")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str):
    """Per-user event counts pivoted into one column per event type —
    the conditional-aggregation (SUM(CASE WHEN ...)) shape.  Partial
    (user, type) counts per batch, one bucketed shuffle on user_id, wide
    row assembled per bucket.  Output: user_id, n_click, n_error,
    n_purchase, n_signup, n_view.
    """
    from ..state import bucketing as B

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size"))
        g["user_id"] = g["user_id"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g

    def _pivot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        wide = g.pivot_table(index="user_id", columns="event_type",
                             values="n", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"user_id": wide.index.astype("int64")})
        for t in EVENT_TYPES:
            out[f"n_{t}"] = (wide[t].to_numpy() if t in wide.columns
                             else 0)
            out[f"n_{t}"] = out[f"n_{t}"].astype("int64")
        return out.reset_index(drop=True)

    ev = read_events(sf_dir, ["user_id", "event_type"]).map_batches(
        _partial, batch_format="pandas")
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _pivot,
                         batch_format="pandas")


def asof_join(sf_dir: str, left_type: str = "click",
              right_type: str = "view"):
    """As-of join: each ``left_type`` event matched to the most recent
    ``right_type`` event of the SAME user at-or-before its timestamp
    (inner semantics — unmatched left rows drop).  The classic
    attribution join; Ray Data has no native as-of join, so this is the
    composition the operator guide prescribes: partition by the equality
    key (bucketed ``grouped_map`` on user_id — one slim-row shuffle),
    sort within the bucket, and resolve the inequality with one
    vectorized forward-fill over the merged event order — no per-row or
    per-user Python loop.

    Partitioning assumption: all events of one user fit one bucket task
    (they share ``hash(user_id) % buckets``); per-bucket volume is
    ``n / buckets`` by uniform hash.

    Output: click_id, user_id, view_id, lag_us (all int64).
    """
    from ..state import bucketing as B

    def _asof(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        is_left = et == left_type
        is_right = et == right_type
        keep = is_left | is_right
        ts, uid, eid = ts[keep], uid[keep], eid[keep]
        side = is_left[keep].astype(np.int8)      # right=0 sorts first on
        n = len(ts)                               # equal ts (>= is inclusive)
        empty = pd.DataFrame({
            "click_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "view_id": pd.Series(dtype="int64"),
            "lag_us": pd.Series(dtype="int64")})
        if n == 0:
            return empty
        order = np.lexsort((eid, side, ts, uid))
        ts, uid, eid, side = ts[order], uid[order], eid[order], side[order]
        # forward-fill the index of the last right-side row, reset per user
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
        seg_start = np.concatenate([[0], np.flatnonzero(
            uid[1:] != uid[:-1]) + 1])
        row_seg_start = seg_start[
            np.searchsorted(seg_start, idx, side="right") - 1]
        hit = (side == 1) & (last_right >= row_seg_start)
        if not hit.any():
            return empty
        j = last_right[hit]
        return pd.DataFrame({
            "click_id": eid[hit], "user_id": uid[hit],
            "view_id": eid[j], "lag_us": ts[hit] - ts[j]})

    ev = read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _asof,
                         batch_format="pandas")


def engaged_users(sf_dir: str, big_purchase: float = 90.0):
    """Users who clicked AND signed up but never made a big purchase —
    the set-operation shape ((click ∩ signup) ∖ big-purchase) composed
    from per-user boolean partials: each batch emits at most one row per
    user seen, one user-bucketed exchange ORs the flags, and the verdict
    is a vectorized boolean expression.  No per-set subquery scans, no
    distinct-shuffles — the event stream is read once.
    Output: user_id (int64).
    """
    from ..state import bucketing as B

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        val = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "has_click": (et == "click").astype(np.int64),
            "has_signup": (et == "signup").astype(np.int64),
            "has_big": ((et == "purchase")
                        & (val > big_purchase)).astype(np.int64)})
        return g.groupby("user_id", as_index=False).max()

    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).max()
        keep = ((g["has_click"] == 1) & (g["has_signup"] == 1)
                & (g["has_big"] == 0))
        return pd.DataFrame({
            "user_id": g.loc[keep, "user_id"].to_numpy(np.int64)})

    ev = read_events(sf_dir, ["user_id", "event_type",
                              "value"]).map_batches(
        _partial, batch_format="pandas")
    return B.grouped_map(ev, "user_id", B.bucket_of_ints, _resolve,
                         batch_format="pandas")
