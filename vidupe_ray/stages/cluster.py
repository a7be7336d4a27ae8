"""Distributed connected components — the explicit clustering operator the
reference never had (SURVEY.md §2.6 A5: Vidupe only enumerates matching
pairs; 'has >= 1 match' is its degenerate grouping, ``comparison.cpp:29-47``).

Implementation: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014 —
PAPERS.md lists the BTS follow-up).  Each round is a pure
``groupby(u).map_groups`` over tiny (u, v) int64 edge rows — no joins, no
driver-side graph.  Converges to star graphs rooted at each component's
minimum doc_id, which makes ``cluster_id = min(doc_id in component)``
deterministic under ANY block order / parallelism level (the N vs 4N
byte-identical-output requirement, SURVEY.md §7.4).

Edges are materialized between rounds (they are tiny relative to the
corpus: only docs with at least one duplicate appear).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import mix64

_C1 = np.uint64(0x9E3779B97F4A7C15)


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


def _large_star_group(df: pd.DataFrame) -> pd.DataFrame:
    u = int(df["u"].iat[0])
    nbrs = df["v"].to_numpy(np.int64)
    m = min(int(nbrs.min()), u)
    big = np.unique(nbrs[nbrs > u])
    if len(big) == 0:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    return pd.DataFrame({"a": big, "b": np.int64(m)})


def _small_star_group(df: pd.DataFrame) -> pd.DataFrame:
    u = int(df["u"].iat[0])
    nbrs = df["v"].to_numpy(np.int64)          # all <= u by orientation
    m = int(nbrs.min())
    nodes = np.unique(np.concatenate([nbrs, [u]]))
    nodes = nodes[nodes != m]
    if len(nodes) == 0:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    return pd.DataFrame({"a": nodes, "b": np.int64(m)})


def _both_directions(df: pd.DataFrame) -> pd.DataFrame:
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    return pd.DataFrame({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})


def _orient_large_to_small(df: pd.DataFrame) -> pd.DataFrame:
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    return pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})


def _drop_self_loops(df: pd.DataFrame) -> pd.DataFrame:
    out = df[df["a"] != df["b"]]
    return out[["a", "b"]]


def connected_components(edges_ds, max_rounds: int = 25):
    """(a, b) edge dataset -> parent mapping dataset (doc_id, cluster_id).

    Only non-root members appear in the mapping; roots (and singletons,
    which never enter the edge list) implicitly map to themselves.
    """
    edges = edges_ds.map_batches(_drop_self_loops, batch_format="pandas")
    edges = edges.materialize()
    if edges.count() == 0:
        return rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                            "cluster_id": pd.Series([], dtype="int64")}))
    prev = _edge_checksum(edges)
    rounds = 0
    while rounds < max_rounds:
        ls = (edges.map_batches(_both_directions, batch_format="pandas")
              .groupby("u").map_groups(_large_star_group,
                                       batch_format="pandas")
              .map_batches(_drop_self_loops, batch_format="pandas"))
        ss = (ls.map_batches(_orient_large_to_small, batch_format="pandas")
              .groupby("u").map_groups(_small_star_group,
                                       batch_format="pandas")
              .map_batches(_drop_self_loops, batch_format="pandas"))
        edges = ss.materialize()
        cur = _edge_checksum(edges)
        rounds += 1
        if cur == prev:
            break
        prev = cur

    # at fixpoint every edge is (member, root); orient and dedupe defensively
    def _parent_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": np.maximum(a, b),
                             "cluster_id": np.minimum(a, b)})

    def _min_parent(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": [int(df["doc_id"].iat[0])],
            "cluster_id": [int(df["cluster_id"].min())]})

    return (edges.map_batches(_parent_rows, batch_format="pandas")
            .groupby("doc_id").map_groups(_min_parent,
                                          batch_format="pandas"))
