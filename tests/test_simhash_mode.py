"""Golden e2e in mode='simhash' (the pHash-mode analogue, the reference
DEFAULT ``prefs.h:14``): phase-1 gate decides alone; oracle must agree."""

import numpy as np
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.corpus import generate_corpus
from vidupe_ray.pipelines import oracle as O
from vidupe_ray.pipelines.dedup import run_dedup

CFG = PipelineConfig(mode="simhash")


@pytest.fixture(scope="module")
def results(ray_session):
    import ray.data as rd
    corpus, truth = generate_corpus(500, seed=21)
    res = run_dedup(rd.from_arrow(corpus), CFG)
    pipe = res.clusters.to_pandas()
    doc_ids = np.asarray(truth["doc_id"].to_pylist(), dtype=np.int64)
    pairs = O.brute_force_pairs(corpus, doc_ids, CFG)
    from vidupe_ray.functions.text import canonicalize
    nonempty = np.array([bool(canonicalize(t))
                         for t in corpus["content"].to_pylist()])
    oracle = O.union_find_clusters(doc_ids[nonempty], pairs)
    return pipe, oracle


def test_simhash_mode_recall(results):
    pipe, oracle = results
    recall = O.cluster_pair_recall(oracle, pipe)
    assert recall >= 0.99, f"simhash-mode recall {recall:.4f}"


def test_simhash_mode_precision(results):
    pipe, oracle = results
    precision = O.cluster_pair_recall(pipe, oracle)
    assert precision >= 0.99, f"simhash-mode precision {precision:.4f}"


def test_simhash_mode_grid_path_byte_identical(ray_session):
    """The grid verify/join plans must be byte-identical in simhash mode
    too (the pHash-mode analogue skips the Jaccard decision but rides the
    same phase-2 join)."""
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.corpus import generate_corpus
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup
    corpus, _ = generate_corpus(500, seed=3)
    base = PipelineConfig(fingerprint_concurrency=2, mode="simhash")
    tiny = PipelineConfig(fingerprint_concurrency=2, mode="simhash",
                          broadcast_cap=100, cc_small_graph_threshold=10)
    res_b = run_dedup(rd.from_arrow(corpus), base)
    res_t = run_dedup(rd.from_arrow(corpus), tiny)
    cb = (res_b.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    ct = (res_t.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(cb, ct)
    pb = res_b.pairs.to_pandas()
    pt = res_t.pairs.to_pandas()
    assert set(zip(pb["a"], pb["b"])) == set(zip(pt["a"], pt["b"]))


def _synthetic_signatures(cfg, n_base=400, seed=7):
    """Random low-Jaccard signature rows + planted slot-distance pairs."""
    import pyarrow as pa
    rng = np.random.RandomState(seed)
    n_perms = cfg.num_perms

    rows = {"doc_id": [], "lang": [], "n_bytes": [], "n_tokens": [],
            "n_shingles": [], "simhash": [], "simhash_head": [],
            "simhash_tail": [], "minhash": [], "anchors": [],
            "low_content": []}

    def _rand64(size=None):
        return rng.randint(0, 1 << 63, size=size, dtype=np.int64) \
                  .astype(np.uint64) * np.uint64(2) + np.uint64(1)

    def _add(doc_id, head, tail, ntok):
        rows["doc_id"].append(doc_id)
        rows["lang"].append("x")
        rows["n_bytes"].append(int(ntok) * 5)
        rows["n_tokens"].append(int(ntok))
        rows["n_shingles"].append(int(ntok))
        rows["simhash"].append(int(head))
        rows["simhash_head"].append(int(head))
        rows["simhash_tail"].append(int(tail))
        # fresh random minhash per doc -> pairwise Jaccard ~ 1/65536 == LOW
        rows["minhash"].append(_rand64(n_perms).tolist())
        rows["anchors"].append([])
        rows["low_content"].append(False)

    for d in range(n_base):
        _add(d, _rand64(), _rand64(), int(rng.randint(100, 2000)))

    planted = []
    nid = n_base
    for dist in (0, 1, 2, 3):
        for _ in range(30):
            head = _rand64()
            tail = _rand64()
            ntok = int(rng.randint(100, 2000))
            flip = np.uint64(0)
            for b in rng.choice(64, size=dist, replace=False):
                flip |= np.uint64(1) << np.uint64(b)
            _add(nid, head, tail, ntok)
            _add(nid + 1, head ^ flip, tail ^ _rand64(), ntok)
            planted.append((nid, nid + 1, dist))
            nid += 2

    tbl = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "lang": pa.array(rows["lang"], pa.string()),
        "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
        "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
        "n_shingles": pa.array(rows["n_shingles"], pa.int64()),
        "simhash": pa.array(rows["simhash"], pa.uint64()),
        "simhash_head": pa.array(rows["simhash_head"], pa.uint64()),
        "simhash_tail": pa.array(rows["simhash_tail"], pa.uint64()),
        "minhash": pa.array(rows["minhash"],
                            pa.list_(pa.uint64(), cfg.num_perms)),
        "anchors": pa.array(rows["anchors"], pa.list_(pa.uint64())),
        "low_content": pa.array(rows["low_content"], pa.bool_()),
    })
    return tbl, planted


def test_simhash_slot_distance_low_jaccard_recall(ray_session):
    """VERDICT r2 #1: the reference matches any pair with slot Hamming
    distance <= 64 - threshold_bits (+modifier) REGARDLESS of whole-doc
    similarity (comparison.cpp:133-151).  Planted pairs at head-slot
    distance 0..3 with ~zero Jaccard (independent random minhashes) must
    be emitted by the sub-band channel and pass the gate: recall >= 0.99
    (pigeonhole makes d <= slot_subbands-1 deterministic)."""
    import ray.data as rd
    from vidupe_ray.stages import lsh

    cfg = PipelineConfig(mode="simhash")
    tbl, planted = _synthetic_signatures(cfg)
    pairs = lsh.candidate_pairs(rd.from_arrow(tbl).repartition(4), cfg)
    got = pairs.to_pandas()
    near = got[got["kind"] == "near"]
    found = set(zip(near["a"], near["b"]))
    hits = sum((a, b) in found for a, b, _ in planted)
    recall = hits / len(planted)
    assert recall >= 0.99, f"slot-distance recall {recall:.4f}"
    # same-length planted pairs: modifier +1 -> best_sim = 65 - d,
    # gate >= 57 passes for every d <= 3; check per-distance too
    by_d = {}
    for a, b, d in planted:
        by_d.setdefault(d, []).append((a, b) in found)
    for d, oks in sorted(by_d.items()):
        assert np.mean(oks) >= 0.99, f"d={d} recall {np.mean(oks):.3f}"


def test_simhash_slot_subbands_no_false_positives(ray_session):
    """Random 16-bit sub-key collisions must be pruned by the exact slot
    gate: no near pair between independent random docs."""
    import ray.data as rd
    from vidupe_ray.stages import lsh

    cfg = PipelineConfig(mode="simhash")
    tbl, planted = _synthetic_signatures(cfg, n_base=600, seed=11)
    base_ids = set(range(600))
    pairs = lsh.candidate_pairs(rd.from_arrow(tbl).repartition(4), cfg)
    near = pairs.to_pandas().query("kind == 'near'")
    # random 64-bit slots are ~32 bits apart -> gate (>= 57 of 64) can
    # essentially never pass between independent docs
    fp = [(a, b) for a, b in zip(near["a"], near["b"])
          if a in base_ids and b in base_ids]
    assert not fp, f"false positives between random docs: {fp[:5]}"
