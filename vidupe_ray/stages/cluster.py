"""Distributed connected components — the explicit clustering operator the
reference never had (SURVEY.md §2.6 A5: Vidupe only enumerates matching
pairs; 'has >= 1 match' is its degenerate grouping, ``comparison.cpp:29-47``).

Implementation: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014 —
PAPERS.md lists the BTS follow-up).  Each round is one bucketed shuffle of
tiny (u, v) int64 edge rows; per-node logic runs as pandas C-level groupby
inside each bucket — no per-node Python calls, no joins, no driver-side
graph.  Converges to star graphs rooted at each component's minimum
doc_id, which makes ``cluster_id = min(doc_id in component)`` deterministic
under ANY block order / parallelism level (the N vs 4N byte-identical
requirement, SURVEY.md §7.4).

Edges are materialized between rounds (they are tiny relative to the
corpus: only docs with at least one duplicate appear).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import mix64
from ..state import bucketing as B

_C1 = np.uint64(0x9E3779B97F4A7C15)
_NUM_BUCKETS = 64


def _edge_checksum(edges_ds) -> tuple:
    """Order-insensitive (count, sum-of-mixed-hashes) fingerprint."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64).astype(np.uint64)
        b = df["b"].to_numpy(np.int64).astype(np.uint64)
        h = mix64(a * _C1 ^ b)
        return pd.DataFrame({"c": [len(df)],
                             "h": [int(h.sum(dtype=np.uint64))]})
    parts = edges_ds.map_batches(_partial, batch_format="pandas").take_all()
    count = sum(p["c"] for p in parts)
    hsum = 0
    for p in parts:
        hsum = (hsum + p["h"]) % (1 << 64)
    return count, hsum


def _large_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Bucket of both-direction edges grouped by u: emit (v, m) for every
    neighbor v > u, where m = min(N(u) ∪ {u})."""
    m = np.minimum(df.groupby("u")["v"].transform("min").to_numpy(np.int64),
                   df["u"].to_numpy(np.int64))
    v = df["v"].to_numpy(np.int64)
    u = df["u"].to_numpy(np.int64)
    sel = v > u
    out = pd.DataFrame({"a": v[sel], "b": m[sel]})
    return out.drop_duplicates()


def _small_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Bucket of large-to-small oriented edges grouped by u (u >= v):
    m = min(N(u)); emit (v, m) for v in N(u) \\ {m} plus (u, m)."""
    g = df.groupby("u")["v"]
    m = g.transform("min").to_numpy(np.int64)
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    part1 = pd.DataFrame({"a": v[v != m], "b": m[v != m]})
    first = ~df.duplicated("u").to_numpy()
    sel = first & (u != m)
    part2 = pd.DataFrame({"a": u[sel], "b": m[sel]})
    return pd.concat([part1, part2], ignore_index=True).drop_duplicates()


def _both_directions(df: pd.DataFrame) -> pd.DataFrame:
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    return pd.DataFrame({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})


def _orient_large_to_small(df: pd.DataFrame) -> pd.DataFrame:
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    return pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})


def _drop_self_loops(df: pd.DataFrame):
    out = df[df["a"] != df["b"]][["a", "b"]].drop_duplicates()
    # Arrow-out with a metadata-free schema: pandas blocks here would be
    # re-converted downstream (union with Arrow edge blocks) and the
    # executor logs a schema-mismatch warning per run
    import pyarrow as pa
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _driver_union_find(edges_ds) -> "rd.Dataset":
    """Small-graph fast path: collect the (tiny) edge list and solve it
    with vectorized min-label propagation + pointer jumping — no per-edge
    Python (2M dict-find iterations cost seconds; this is ~100 ms).
    Identical output contract (min-doc_id roots) as the distributed
    rounds."""
    parts = [b for b in edges_ds.iter_batches(batch_size=1 << 20,
                                              batch_format="pandas")]
    df = (pd.concat(parts, ignore_index=True) if parts
          else pd.DataFrame({"a": [], "b": []}, dtype="int64"))
    if not len(df):
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64")}))
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[:len(a)], inv[len(a):]
    # ids are sorted, so min label index == min doc_id in the component
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, ea, lab[eb])
        np.minimum.at(lab, eb, lab[ea])
        lab = np.minimum(lab, lab[lab])     # pointer jump (compress)
        lab = lab[lab]
        if np.array_equal(lab, old):
            break
    out = pd.DataFrame({"doc_id": ids, "cluster_id": ids[lab]})
    out = out[out["doc_id"] != out["cluster_id"]]
    return rd.from_pandas(out.reset_index(drop=True))


def connected_components(edges_ds, max_rounds: int = 25,
                         small_graph_threshold: int = 2_000_000):
    """(a, b) edge dataset -> parent mapping dataset (doc_id, cluster_id).

    Only non-root members appear in the mapping; roots (and singletons,
    which never enter the edge list) implicitly map to themselves.

    Hybrid execution (ray_guide.md joins section): below
    ``small_graph_threshold`` edges the graph is collected and solved
    driver-side (the per-round shuffle overhead would dominate);  above it
    the alternating-star rounds run fully distributed.  Both paths emit
    identical, order-independent labels.
    """
    edges = edges_ds.map_batches(_drop_self_loops, batch_format="pandas")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64")}))
    if n_edges <= small_graph_threshold:
        return _driver_union_find(edges)
    prev = _edge_checksum(edges)
    rounds = 0
    converged = False
    while rounds < max_rounds:
        # hash_grouped_map, not grouped_map: each star round shuffles tiny
        # (u, v) int64 rows — O(edges), orders of magnitude below the
        # corpus — so Ray's sort-shuffle sample pass + two barriers per
        # exchange (x2 exchanges x rounds) dominate the data movement.
        # The two-wave task shuffle has no sort and no inter-wave barrier;
        # the per-bucket reductions are identical (same bucket_fn).
        ls = B.hash_grouped_map(
            edges.map_batches(_both_directions, batch_format="pandas"),
            "u", B.bucket_of_ints, _large_star_bucket,
            num_buckets=_NUM_BUCKETS, batch_format="pandas")
        ss = B.hash_grouped_map(
            ls.map_batches(_orient_large_to_small, batch_format="pandas"),
            "u", B.bucket_of_ints, _small_star_bucket,
            num_buckets=_NUM_BUCKETS, batch_format="pandas")
        edges = ss.map_batches(_drop_self_loops,
                               batch_format="pandas").materialize()
        cur = _edge_checksum(edges)
        rounds += 1
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # never emit intermediate (non-root) labels silently (ADVICE r1):
        # the residual graph is already star-compressed and far smaller
        # than the input — finish it exactly on the driver
        import logging
        logging.getLogger(__name__).warning(
            "connected_components: no fixpoint after %d rounds; "
            "finishing the residual graph (%d edges) with driver "
            "union-find", max_rounds, edges.count())
        return _driver_union_find(edges)

    # at fixpoint every edge is (member, root); orient and reduce to the
    # min root per member defensively (one more tiny bucketed pass)
    def _parent_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": np.maximum(a, b),
                             "cluster_id": np.minimum(a, b)})

    def _min_parent(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)["cluster_id"].min()
        return g

    return B.hash_grouped_map(
        edges.map_batches(_parent_rows, batch_format="pandas"),
        "doc_id", B.bucket_of_ints, _min_parent,
        num_buckets=_NUM_BUCKETS, batch_format="pandas")
