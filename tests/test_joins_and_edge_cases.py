"""Exercise the scale-path fallbacks and input edge cases:
- bucketed semi-join (the above-broadcast-cap path) must match broadcast
- unicode / null / degenerate content must flow through the pipeline
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.pipelines.dedup import run_dedup


def test_bucketed_semi_join_matches_broadcast(ray_session):
    import ray.data as rd
    from vidupe_ray.state.joins import bucketed_semi_join
    rng = np.random.RandomState(4)
    df = pd.DataFrame({"doc_id": rng.permutation(10_000).astype("int64"),
                       "v": np.arange(10_000)})
    ds = rd.from_pandas(df).repartition(8)
    keys = rng.choice(10_000, size=800, replace=False).astype(np.int64)
    got = bucketed_semi_join(ds, keys, "doc_id", buckets=16).to_pandas()
    want = df[df.doc_id.isin(keys)]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_pipeline_with_tiny_broadcast_cap_uses_bucketed_path(ray_session):
    """Force the winner filter down the bucketed-join path (the 10^12-scale
    route) and require identical clusters."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    corpus, _ = generate_corpus(300, seed=23)
    # broadcast_cap below the winner count (~260) -> bucketed path;
    # containment off so its (smaller) broadcasts don't hit the tiny cap
    cfg2 = PipelineConfig(broadcast_cap=270, containment=False,
                          cc_small_graph_threshold=10**9)
    res2 = run_dedup(rd.from_arrow(corpus), cfg2)
    cfg3 = PipelineConfig(broadcast_cap=100_000, containment=False,
                          cc_small_graph_threshold=10**9)
    res3 = run_dedup(rd.from_arrow(corpus), cfg3)
    c2 = (res2.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    c3 = (res3.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c2, c3)


def test_unicode_and_degenerate_content(ray_session):
    import ray.data as rd
    rows = [
        ("r/a", "u1.py", "emoji 🎉🎊 content ✨ " * 50),
        ("r/a", "u2.py", "emoji 🎉🎊 content ✨ " * 50),          # dup of u1
        ("r/b", "cjk.py", "中文注释 变量 = 函数(参数) " * 80),
        ("r/b", "mixed.py", "def fn(): # ümlaut éàç\n    return 'ß'\n" * 40),
        ("r/c", "oneline.py", "x = 1; " * 20_000),               # 140KB one line
        ("r/c", "null.py", None),                                 # null content
        ("r/c", "empty.py", ""),
        ("r/c", "ws.py", "   \n\t\n   "),                         # whitespace only
    ]
    t = pa.table({
        "repo": pa.array([r[0] for r in rows]),
        "path": pa.array([r[1] for r in rows]),
        "commit": pa.array(["a" * 40] * len(rows)),
        "lang": pa.array(["py"] * len(rows)),
        "content": pa.array([r[2] for r in rows], pa.string()),
    })
    res = run_dedup(rd.from_arrow(t), PipelineConfig())
    cl = res.clusters.to_pandas()
    rejects = res.rejects.to_pandas()
    # null/empty/whitespace-only rejected; others clustered
    assert len(rejects) == 3
    assert len(cl) == 5
    # the emoji dup pair clusters together
    from vidupe_ray.functions.text import doc_id_for
    i1 = doc_id_for("r/a", "u1.py", "a" * 40)
    i2 = doc_id_for("r/a", "u2.py", "a" * 40)
    c = cl.set_index("doc_id")["cluster_id"]
    assert c.loc[i1] == c.loc[i2]


def test_resume_with_bucketed_join_path(ray_session, tmp_path):
    """Per-doc resume when the winner-id set exceeds broadcast_cap: the
    cached-signature filter must take the bucketed join and still produce
    identical clusters."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    corpus, _ = generate_corpus(300, seed=31)
    cfg = PipelineConfig(broadcast_cap=150, containment=False,
                         cc_small_graph_threshold=10**9)
    d = str(tmp_path / "ck")
    r1 = run_dedup(rd.from_arrow(corpus), cfg, checkpoint_dir=d)
    r2 = run_dedup(rd.from_arrow(corpus), cfg, checkpoint_dir=d)
    assert r2.metrics["signatures_resumed"] is True
    c1 = (r1.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    c2 = (r2.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c1, c2)


def test_lang_allowlist_filters_pipeline(ray_session):
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    corpus, _ = generate_corpus(300, seed=8)
    all_res = run_dedup(rd.from_arrow(corpus), PipelineConfig())
    py_res = run_dedup(rd.from_arrow(corpus),
                       PipelineConfig(lang_allowlist=("py",)))
    n_all = all_res.clusters.count()
    n_py = py_res.clusters.count()
    assert 0 < n_py < n_all
    langs = set(py_res.docs.to_pandas()["lang"])
    assert langs == {"py"}


def test_fingerprint_canonical_branch_matches_raw(ray_session):
    """normalize(emit_canonical=True) -> fingerprint must yield the same
    signatures as the raw-content path (tokens are canonicalization
    invariant)."""
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.stages.normalize import normalize_batch
    from vidupe_ray.stages.fingerprint import fingerprint_dataset
    cfg = PipelineConfig()
    corpus, _ = generate_corpus(120, seed=6)
    ds = rd.from_arrow(corpus)
    raw_sigs = (fingerprint_dataset(ds, cfg).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
    canon_ds = ds.map_batches(
        lambda t: normalize_batch(t, emit_canonical=True),
        batch_format="pyarrow")
    canon_sigs = (fingerprint_dataset(canon_ds, cfg).to_pandas()
                  .sort_values("doc_id").reset_index(drop=True))
    for col in ["doc_id", "simhash", "simhash_head", "simhash_tail",
                "n_tokens", "n_shingles"]:
        assert (raw_sigs[col] == canon_sigs[col]).all(), col


def _cluster_frame(res):
    return (res.clusters.to_pandas()
            [["doc_id", "cluster_id", "cluster_size", "is_canonical"]]
            .sort_values("doc_id").reset_index(drop=True))


def _pair_set(res):
    df = res.pairs.to_pandas()
    return set(zip(df["a"], df["b"]))


def test_flagship_broadcast_cap_100_byte_identical(ray_session):
    """VERDICT r1 item 1 'Done' gate: the FULL flagship (containment ON)
    with broadcast_cap=100 must route every join site through the bucketed
    fallback (verify signature join, containment content join, parent-map
    lookup join, winner anti-join shards, distributed CC) and produce
    byte-identical clusters AND pairs vs the broadcast path."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    corpus, _ = generate_corpus(900, seed=42)
    base = PipelineConfig(fingerprint_concurrency=2)
    tiny = PipelineConfig(fingerprint_concurrency=2, broadcast_cap=100,
                          cc_small_graph_threshold=10)
    res_b = run_dedup(rd.from_arrow(corpus), base)
    res_t = run_dedup(rd.from_arrow(corpus), tiny)
    pd.testing.assert_frame_equal(_cluster_frame(res_b),
                                  _cluster_frame(res_t))
    assert _pair_set(res_b) == _pair_set(res_t)
    # loser anti-join invariant: broadcast footprint scales with
    # duplicates + rejects, never the corpus
    m = res_t.metrics
    assert m["n_removal_set"] == m["n_losers"] + m["n_rejects"]
    assert m["n_removal_set"] < m["n_input"]


def test_cand_key_chunks_identical(ray_session):
    """Key-chunked candidate generation (the bounded-exchange scale plan:
    C sequential emit->shuffle->gate passes over disjoint key-space
    chunks) must produce the SAME raw pair multiset as the single pass —
    a key's whole segment lives in exactly one chunk — and the flagship
    must stay byte-identical end-to-end."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.stages import lsh
    from vidupe_ray.stages.fingerprint import fingerprint_dataset

    corpus, _ = generate_corpus(900, seed=42)

    # operator-level: raw candidate multiset identical at chunks=3
    base = PipelineConfig(fingerprint_concurrency=2)
    sigs = fingerprint_dataset(rd.from_arrow(corpus), base).materialize()

    def multiset(cfg):
        df = lsh.candidate_pairs(sigs, cfg, dedupe=False).to_pandas()
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True))
    one = multiset(PipelineConfig(cand_key_chunks=1))
    three = multiset(PipelineConfig(cand_key_chunks=3))
    pd.testing.assert_frame_equal(one, three)
    assert len(one) > 0

    # end-to-end: clusters and pairs byte-identical, auto metric recorded
    res_1 = run_dedup(rd.from_arrow(corpus), base)
    res_3 = run_dedup(rd.from_arrow(corpus),
                      PipelineConfig(fingerprint_concurrency=2,
                                     cand_key_chunks=3))
    pd.testing.assert_frame_equal(_cluster_frame(res_1),
                                  _cluster_frame(res_3))
    assert _pair_set(res_1) == _pair_set(res_3)
    assert res_3.metrics["cand_key_chunks"] == 3
    assert res_1.metrics["cand_key_chunks"] == 1


def test_cand_chunk_resolution_and_empty_chunks(ray_session):
    """ADVICE r4 closure: (a) resolve_cand_chunks is the single source of
    truth — explicit config wins and clamps, a non-positive budget raises
    instead of ZeroDivisionError; (b) a chunk whose key residue is
    unpopulated (tiny corpus, user-set chunks) is dropped before the
    union, so the output keeps the pair schema instead of leaking the
    slim emission schema."""
    import pytest
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.stages import lsh
    from vidupe_ray.stages.fingerprint import fingerprint_dataset

    base = PipelineConfig()
    # explicit wins and is clamped to the sequential-pass cap
    assert lsh.resolve_cand_chunks(
        PipelineConfig(cand_key_chunks=5), 10) == 5
    assert lsh.resolve_cand_chunks(
        PipelineConfig(cand_key_chunks=10_000), 10) == lsh._MAX_CAND_CHUNKS
    # auto: ceil(est/budget), never 0
    assert lsh.resolve_cand_chunks(base, 0) == 1
    per_doc = lsh.emission_rows_per_doc(base) * lsh.EMIT_ROW_BYTES
    n_two = (base.cand_emit_budget // per_doc) + 1
    assert lsh.resolve_cand_chunks(base, n_two) == 2
    # non-positive budget: rejected at config build AND at use site
    with pytest.raises(ValueError):
        PipelineConfig(cand_emit_budget=0)
    bad = PipelineConfig(cand_key_chunks=1)  # passes __post_init__ guard
    object.__setattr__(bad, "cand_key_chunks", 0)
    object.__setattr__(bad, "cand_emit_budget", 0)
    with pytest.raises(ValueError):
        lsh.resolve_cand_chunks(bad, 10)

    # (b) 16 chunks over a 60-doc corpus leaves key residues empty; the
    # union must still carry the PAIR schema and match the single pass
    corpus, _ = generate_corpus(60, seed=11)
    sigs = fingerprint_dataset(rd.from_arrow(corpus), base).materialize()
    one = lsh.candidate_pairs(sigs, PipelineConfig(cand_key_chunks=1),
                              dedupe=False).to_pandas()
    many = lsh.candidate_pairs(sigs, PipelineConfig(cand_key_chunks=16),
                               dedupe=False).to_pandas()
    assert list(many.columns) == list(one.columns) == \
        [f.name for f in lsh.PAIR_SCHEMA]
    key = lambda df: (df.sort_values(list(df.columns))
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(key(one), key(many))


def test_containment_bytes_cap_forces_bucketed_content_join(ray_session):
    """broadcast_bytes_cap bounds the content broadcast by BYTES (ADVICE
    r1): a tiny byte cap must push the substring confirm onto the bucketed
    content join and keep outputs identical."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    corpus, _ = generate_corpus(400, seed=7)
    base = PipelineConfig(fingerprint_concurrency=2)
    tinyb = PipelineConfig(fingerprint_concurrency=2,
                           broadcast_bytes_cap=1024)
    res_b = run_dedup(rd.from_arrow(corpus), base)
    res_t = run_dedup(rd.from_arrow(corpus), tinyb)
    pd.testing.assert_frame_equal(_cluster_frame(res_b),
                                  _cluster_frame(res_t))
    assert _pair_set(res_b) == _pair_set(res_t)


def test_pin_corpus_auto_gate(ray_session, tmp_path):
    """pin_corpus=None sizes the decision to the object store: in-memory
    corpora pin (free), corpora estimated over the capacity fraction do
    not (the 100 TB posture)."""
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus, write_corpus
    corpus, _ = generate_corpus(200, seed=3)
    res = run_dedup(rd.from_arrow(corpus),
                    PipelineConfig(containment=False))
    assert res.metrics["pin_corpus_auto"] is True      # resident data

    cdir = write_corpus(str(tmp_path / "c"), 200, seed=3)
    res2 = run_dedup(rd.read_parquet(cdir),
                     PipelineConfig(containment=False,
                                    pin_corpus_fraction=0.0))
    assert res2.metrics["pin_corpus_auto"] is False    # over the fraction
    assert res2.metrics["corpus_bytes_estimate"] > 0


def test_grid_pair_apply_matches_pandas_merge(ray_session):
    """Unit-level check of the grid join against a pandas double-merge
    reference: random pairs x random payload, every cell path exercised."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.state.joins import grid_pair_apply

    rng = np.random.RandomState(9)
    ids = rng.permutation(20_000)[:5000].astype(np.int64)
    payload = pd.DataFrame({"doc_id": ids,
                            "val": rng.randint(0, 1 << 40, size=5000)
                            .astype("int64")})
    a = rng.choice(ids, size=3000).astype(np.int64)
    b = rng.choice(ids, size=3000).astype(np.int64)
    pairs = pd.DataFrame({"a": a, "b": b})

    def _cell(cell: pa.Table, sa, sb) -> pa.Table:
        if cell.num_rows == 0 or sa[1] is None or sb[1] is None:
            return pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("s", pa.int64())]).empty_table()
        ids_a, tbl_a = sa
        ids_b, tbl_b = sb
        aa = cell.column("a").to_numpy(zero_copy_only=False)
        bb = cell.column("b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_a, aa)
        ib = np.searchsorted(ids_b, bb)
        va = tbl_a.column("val").to_numpy(zero_copy_only=False)[ia]
        vb = tbl_b.column("val").to_numpy(zero_copy_only=False)[ib]
        return pa.table({"a": pa.array(aa), "b": pa.array(bb),
                         "s": pa.array(va + vb, pa.int64())})

    got = grid_pair_apply(
        rd.from_pandas(pairs).repartition(6),
        rd.from_pandas(payload).repartition(5),
        _cell, k=4, blocks_per_builder=2).to_pandas()
    want = (pairs.merge(payload.rename(columns={"doc_id": "a",
                                                "val": "va"}), on="a")
            .merge(payload.rename(columns={"doc_id": "b", "val": "vb"}),
                   on="b"))
    want["s"] = want["va"] + want["vb"]
    g = got.sort_values(["a", "b", "s"]).reset_index(drop=True)
    w = want[["a", "b", "s"]].sort_values(["a", "b", "s"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_grid_pair_apply_all_empty_builder_chunk(ray_session):
    """ADVICE r2 (high): a builder chunk made ENTIRELY of empty blocks
    must not crash concat_tables — this is the routine shape after
    filter_by_key_shards leaves sparse candidates over many corpus
    blocks."""
    import ray.data as rd
    from vidupe_ray.state.joins import grid_pair_apply

    schema = pa.schema([("doc_id", pa.int64()), ("val", pa.int64())])
    empty = schema.empty_table()
    data = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "val": pa.array([10, 20, 30], pa.int64())})
    # blocks: [empty, empty] -> first builder chunk is all-empty
    right = rd.from_arrow([empty, empty, data, empty])
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": np.array([1, 1, 2], np.int64),
         "b": np.array([2, 3, 3], np.int64)}))

    def _cell(cell: pa.Table, sa, sb) -> pa.Table:
        out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("s", pa.int64())])
        if cell.num_rows == 0 or sa[1] is None or sb[1] is None:
            return out_schema.empty_table()
        ids_a, tbl_a = sa
        ids_b, tbl_b = sb
        aa = cell.column("a").to_numpy(zero_copy_only=False)
        bb = cell.column("b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_a, aa)
        ib = np.searchsorted(ids_b, bb)
        va = tbl_a.column("val").to_numpy(zero_copy_only=False)[ia]
        vb = tbl_b.column("val").to_numpy(zero_copy_only=False)[ib]
        return pa.table({"a": pa.array(aa), "b": pa.array(bb),
                         "s": pa.array(va + vb, pa.int64())})

    got = grid_pair_apply(pairs, right, _cell, k=2,
                          blocks_per_builder=2).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = pd.DataFrame({"a": [1, 1, 2], "b": [2, 3, 3],
                         "s": [30, 40, 50]}).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_asof_join_edge_cases(ray_session, tmp_path):
    """As-of semantics vs pandas merge_asof on planted edge cases:
    click at the exact view ts (inclusive match), click before any view
    (drops), user with no views at all (drops), multiple clicks sharing
    one view, view newer than every click (unused)."""
    from vidupe_ray.pipelines.events import asof_join
    base = np.datetime64("2025-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    rows = [
        # user 1: views at t=10, t=20; clicks at t=5 (drop), t=10
        # (inclusive -> view@10), t=15 (view@10), t=25 (view@20)
        (101, 10, 1, "view"), (102, 20, 1, "view"),
        (201, 5, 1, "click"), (202, 10, 1, "click"),
        (203, 15, 1, "click"), (204, 25, 1, "click"),
        # user 2: no views, one click (drops)
        (205, 7, 2, "click"),
        # user 3: one view after its only click (drops), plus a purchase
        (103, 50, 3, "view"), (206, 40, 3, "click"),
        (301, 41, 3, "purchase"),
    ]
    df = pd.DataFrame({
        "event_id": np.array([r[0] for r in rows], np.int64),
        "ts": base + np.array([r[1] for r in rows]) * s,
        "user_id": np.array([r[2] for r in rows], np.int64),
        "event_type": [r[3] for r in rows],
        "value": np.zeros(len(rows)),
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = asof_join(str(tmp_path)).to_pandas().sort_values(
        "click_id").reset_index(drop=True)

    clicks = df[df.event_type == "click"].sort_values("ts")
    views = df[df.event_type == "view"].sort_values("ts")
    want = pd.merge_asof(clicks, views, on="ts", by="user_id",
                         direction="backward", suffixes=("", "_v"))
    want = want.dropna(subset=["event_id_v"])
    want = pd.DataFrame({
        "click_id": want["event_id"].astype("int64").to_numpy(),
        "view_id": want["event_id_v"].astype("int64").to_numpy(),
    }).sort_values("click_id").reset_index(drop=True)
    assert got["click_id"].tolist() == [202, 203, 204]
    assert got[["click_id", "view_id"]].to_dict("list") == \
        want.to_dict("list")
    assert got["lag_us"].tolist() == [0, 5_000_000, 5_000_000]


def test_interval_join_count_kernel():
    """_count_upto vs a brute-force reference on random (uid, ts) data,
    both inclusive and exclusive, including exact-boundary ties."""
    from vidupe_ray.pipelines.relational import _count_upto
    rng = np.random.RandomState(7)
    uid_v = np.sort(rng.randint(0, 20, 300).astype(np.int64))
    # coarse ts grid => plenty of exact ties between views and queries
    ts_v = rng.randint(0, 50, 300).astype(np.int64)
    order = np.lexsort((ts_v, uid_v))
    uid_v, ts_v = uid_v[order], ts_v[order]
    uid_q = rng.randint(0, 22, 100).astype(np.int64)   # some absent uids
    ts_q = rng.randint(-5, 55, 100).astype(np.int64)
    for inclusive in (True, False):
        got = _count_upto(uid_v, ts_v, uid_q, ts_q, inclusive)
        cmp = np.less_equal if inclusive else np.less
        want = np.array([
            int(((uid_v == u) & cmp(ts_v, t)).sum())
            for u, t in zip(uid_q, ts_q)], np.int64)
        np.testing.assert_array_equal(got, want)


def test_interval_join_edge_cases(ray_session, tmp_path):
    """Window boundaries are inclusive on both ends; zero-view purchases
    are kept (left-outer count semantics)."""
    from vidupe_ray.pipelines.relational import interval_join
    base = np.datetime64("2025-01-01T12:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [
        # user 1: views at -3600s (in, boundary), -3601s (out), 0s (in)
        (1, -3600, 1, "view"), (2, -3601, 1, "view"), (3, 0, 1, "view"),
        (10, 0, 1, "purchase"),
        # user 2: no views at all
        (11, 0, 2, "purchase"),
        # user 3: only a future view
        (4, 100, 3, "view"), (12, 0, 3, "purchase"),
    ]
    df = pd.DataFrame({
        "event_id": np.array([r[0] for r in rows], np.int64),
        "ts": base + np.array([r[1] for r in rows]) * s,
        "user_id": np.array([r[2] for r in rows], np.int64),
        "event_type": [r[3] for r in rows],
        "value": np.zeros(len(rows)),
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = interval_join(str(tmp_path)).to_pandas().sort_values(
        "purchase_id").reset_index(drop=True)
    assert got["purchase_id"].tolist() == [10, 11, 12]
    assert got["n_views"].tolist() == [2, 0, 0]


def test_fused_fingerprint_plan_byte_identical(ray_session):
    """Round-4 plan gate: the fused single-pass normalize+fingerprint
    plan (signatures for ALL docs, losers dropped post-hoc; content
    never materialized) must produce byte-identical clusters AND pairs
    vs the winners-first plan on a corpus WITH exact dups and rejects."""
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.pipelines.dedup import run_dedup
    corpus, _ = generate_corpus(900, seed=42)
    # plant exact dups + an empty doc so the removal filter is non-trivial
    extra = pa.table({
        "repo": pa.array(["x/r"] * 3, pa.string()),
        "path": pa.array([f"c{i}.py" for i in range(3)], pa.string()),
        "commit": pa.array(["e" * 40] * 3, pa.string()),
        "lang": pa.array(["py"] * 3, pa.string()),
        "content": pa.array(
            [corpus.column("content")[0].as_py(),
             corpus.column("content")[0].as_py(), "   \n  "],
            corpus.schema.field("content").type),
    })
    big = pa.concat_tables([corpus, extra])
    frames = {}
    for fused in (False, True):
        cfg = PipelineConfig(fingerprint_concurrency=2,
                             fused_fingerprint=fused)
        res = run_dedup(rd.from_arrow(big), cfg)
        frames[fused] = (_cluster_frame(res), _pair_set(res))
    cf, pf = frames[False]
    ct, pt = frames[True]
    assert pf == pt
    pd.testing.assert_frame_equal(cf, ct)


def test_hash_grouped_map_matches_grouped_map(ray_session):
    """Round-4 floor work: the two-wave task shuffle must produce the
    same per-group reductions as the sort-shuffle grouped_map (same
    bucket_fn, same apply_fn) — exact_dedup switches between them purely
    on overhead grounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.state import bucketing as B

    rng = np.random.RandomState(7)
    n = 5000
    keys = np.array([f"k{v}" for v in rng.randint(0, 800, n)], dtype=object)
    df = pd.DataFrame({"sha256_canon": keys,
                       "doc_id": rng.permutation(n).astype("int64")})

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby("sha256_canon")["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "winner_id": w.astype("int64")})

    ds = rd.from_pandas(df).repartition(6)
    a = B.grouped_map(ds, "sha256_canon", B.bucket_of_strings, winners,
                      num_buckets=16, batch_format="pandas").to_pandas()
    b = B.hash_grouped_map(ds, "sha256_canon", B.bucket_of_strings,
                           winners, num_buckets=16,
                           batch_format="pandas").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # empty-bucket hygiene: more buckets than keys still yields one schema
    c = B.hash_grouped_map(ds.limit(3), "sha256_canon",
                           B.bucket_of_strings, winners, num_buckets=32,
                           batch_format="pandas")
    got = c.to_pandas()
    assert list(got.columns) == ["doc_id", "winner_id"]
    assert len(got) == 3
