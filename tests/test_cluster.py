"""Connected-components tests: distributed star rounds vs driver
union-find must produce identical labels (SURVEY.md §2.6 A5)."""

import numpy as np
import pandas as pd
import pytest

from vidupe_ray.stages.cluster import connected_components


def _labels(ds):
    df = ds.to_pandas()
    return dict(zip(df["doc_id"].astype(int), df["cluster_id"].astype(int)))


@pytest.fixture()
def random_graph():
    rng = np.random.RandomState(11)
    n = 400
    edges = []
    # chains, stars, cliques and random noise
    for base in range(0, 100, 10):
        for k in range(9):
            edges.append((base + k, base + k + 1))       # chain
    for hub in [200, 220, 240]:
        for k in range(1, 15):
            edges.append((hub + k, hub))                 # star
    for a in range(300, 310):
        for b in range(a + 1, 310):
            edges.append((a, b))                         # clique
    ex = rng.randint(320, 400, size=(60, 2))
    edges.extend([tuple(e) for e in ex if e[0] != e[1]])
    return pd.DataFrame(edges, columns=["a", "b"]).astype("int64")


def test_distributed_matches_driver(ray_session, random_graph):
    import ray.data as rd
    ds = rd.from_pandas(random_graph)
    got_driver = _labels(connected_components(
        ds, small_graph_threshold=10**9))
    got_dist = _labels(connected_components(
        ds, small_graph_threshold=0))
    # same set of non-root nodes, same root for every node
    assert got_driver == got_dist


def test_min_root_property(ray_session, random_graph):
    import ray.data as rd
    labels = _labels(connected_components(
        rd.from_pandas(random_graph), small_graph_threshold=0))
    # build adjacency, BFS components, compare min
    adj = {}
    for a, b in random_graph.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        frontier = [start]
        while frontier:
            x = frontier.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    frontier.append(y)
        seen |= comp
        root = min(comp)
        for n in comp:
            want = root if n != root else labels.get(n, n)
            assert labels.get(n, n) == root


def test_empty_edges(ray_session):
    import ray.data as rd
    ds = rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                      "b": pd.Series([], dtype="int64")}))
    assert connected_components(ds).count() == 0


def test_non_convergence_falls_back_to_exact(ray_session):
    """ADVICE r1: exhausting max_rounds must never silently emit
    intermediate labels — the residual graph is finished exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.stages.cluster import (connected_components,
                                           _driver_union_find)
    rng = np.random.RandomState(11)
    # long chains converge slowly: 40 chains of length 60
    a, b = [], []
    for c in range(40):
        base = c * 1000
        ids = base + np.arange(60)
        a.extend(ids[:-1]); b.extend(ids[1:])
    df = pd.DataFrame({"a": np.array(a, np.int64),
                       "b": np.array(b, np.int64)})
    edges = rd.from_pandas(df)
    got = (connected_components(edges, max_rounds=1,
                                small_graph_threshold=0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (_driver_union_find(rd.from_pandas(df))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # every chain must map to its minimum id
    assert set(got["cluster_id"]) == {c * 1000 for c in range(40)}


def test_canonical_pick_multi_attribute(ray_session):
    """VERDICT r3 #5: the canonical pick mirrors the reference's
    highlightBetterProperties ranking (comparison.cpp:266-330) — size
    decides only beyond the ±tolerance (comparison.cpp:270); within
    tolerance, earliest mtime wins; mtime ties break on min doc_id."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import assign_clusters

    cfg = PipelineConfig(canonical_size_tolerance=100)
    # cluster 1: sizes within tolerance (1000 vs 950) -> mtime decides
    #            (doc 11, later-size-smaller but earliest mtime)
    # cluster 2: size gap beyond tolerance -> largest wins despite mtime
    # cluster 3: mtime tie within tolerance -> min doc_id
    docs = pa.table({
        "doc_id": pa.array([10, 11, 20, 21, 30, 31], pa.int64()),
        "n_bytes": pa.array([1000, 950, 1000, 500, 800, 800], pa.int64()),
        "mtime": pa.array([5, 1, 1, 0, 7, 7], pa.int64()),
        "status": pa.array(["ok"] * 6, pa.string()),
    })
    parents = pa.table({
        "doc_id": pa.array([10, 11, 20, 21, 30, 31], pa.int64()),
        "cluster_id": pa.array([10, 10, 20, 20, 30, 30], pa.int64()),
    })
    out = assign_clusters(rd.from_arrow(docs), rd.from_arrow(parents),
                          cfg).to_pandas()
    canon = out[out["is_canonical"]].set_index("cluster_id")["doc_id"]
    assert canon.loc[10] == 11     # within tol, earliest mtime
    assert canon.loc[20] == 20     # beyond tol, size wins
    assert canon.loc[30] == 30     # mtime tie, min doc_id
    assert (out.groupby("cluster_id")["is_canonical"].sum() == 1).all()


def test_assign_cluster_paths_identical(ray_session):
    """Round-4 floor work: assign_clusters has THREE routes (broadcast
    zero-shuffle fast path, single full shuffle, sharded dup/singleton
    split) gated only on size thresholds — all must emit identical rows
    for the same input."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import assign_clusters

    rng = np.random.RandomState(3)
    n = 1200
    ids = np.arange(n, dtype=np.int64)
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bytes": pa.array(rng.randint(100, 5000, n).astype(np.int64)),
        "mtime": pa.array(rng.randint(0, 10**6, n).astype(np.int64)),
        "status": pa.array(np.where(rng.rand(n) < 0.05, "reject", "ok")),
    })
    # ~100 clusters of sizes 2-6; parents carry only non-root members
    members, roots = [], []
    next_id = 0
    while next_id < 600:
        size = int(rng.randint(2, 7))
        grp = ids[next_id:next_id + size]
        members.extend(grp[1:]); roots.extend([grp[0]] * (len(grp) - 1))
        next_id += size + int(rng.randint(0, 8))
    parents = pa.table({
        "doc_id": pa.array(np.array(members, np.int64)),
        "cluster_id": pa.array(np.array(roots, np.int64)),
    })

    def run(cfg):
        out = assign_clusters(rd.from_arrow(docs), rd.from_arrow(parents),
                              cfg).to_pandas()
        return (out.sort_values("doc_id").reset_index(drop=True)
                [["doc_id", "n_bytes", "mtime", "cluster_id",
                  "cluster_size", "is_canonical"]])

    broadcast = run(PipelineConfig())                       # 2*|parents| << cap
    single = run(PipelineConfig(broadcast_cap=1,
                                assign_split_threshold=10**9))
    split = run(PipelineConfig(broadcast_cap=1,
                               assign_split_threshold=0))
    pd.testing.assert_frame_equal(broadcast, single)
    pd.testing.assert_frame_equal(broadcast, split)
    # sanity: every dup cluster kept exactly one canonical member
    dup = broadcast[broadcast["cluster_size"] > 1]
    assert (dup.groupby("cluster_id")["is_canonical"].sum() == 1).all()
    # expected dup rows = ok-status members of clusters with >=2 ok members
    ok_ids = set(docs.to_pandas().query("status == 'ok'")["doc_id"])
    want = {}
    for m, r in zip(members, roots):
        want.setdefault(r, {r} if r in ok_ids else set())
        if m in ok_ids:
            want[r].add(m)
    n_expected = sum(len(v) for v in want.values() if len(v) > 1)
    assert len(dup) == n_expected > 0
    # EMPTY parents (no dups at all): the real pipeline feeds
    # connected_components output here, which on zero edges collects to a
    # frame with NO columns — the broadcast path must still emit every ok
    # doc as a singleton (regression: KeyError 'doc_id')
    no_edges = rd.from_pandas(pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64")}))
    empty_parents = connected_components(no_edges)
    out = assign_clusters(rd.from_arrow(docs), empty_parents,
                          PipelineConfig()).to_pandas()
    assert (out["cluster_size"] == 1).all() and out["is_canonical"].all()
    assert len(out) == int((docs.to_pandas()["status"] == "ok").sum())
