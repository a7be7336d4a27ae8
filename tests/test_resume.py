"""Checkpoint/resume tests — the cache.db semantic (SURVEY.md §5.4):
rerun must skip fingerprinting and produce identical output; stale or
config-mismatched checkpoints must never be read."""

import shutil

import pandas as pd
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.corpus import generate_corpus
from vidupe_ray.pipelines.dedup import run_dedup

CFG = PipelineConfig()


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _clusters(res):
    return (res.clusters.to_pandas()[["doc_id", "cluster_id"]]
            .sort_values("doc_id").reset_index(drop=True))


def test_resume_skips_fingerprint_and_is_identical(ray_session, ckpt_dir):
    import ray.data as rd
    corpus, _ = generate_corpus(300, seed=17)
    r1 = run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    c1 = _clusters(r1)
    assert r1.metrics["signatures_resumed"] is False
    r2 = run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    c2 = _clusters(r2)
    assert r2.metrics["signatures_resumed"] is True
    pd.testing.assert_frame_equal(c1, c2)


def test_input_growth_recomputes_only_the_delta(ray_session, ckpt_dir):
    """Per-document resume (the cache.db semantic, db.cpp:50-69): adding
    docs to the corpus reuses every cached signature and fingerprints only
    the new rows; output matches a fresh run exactly."""
    import pyarrow as pa
    import ray.data as rd
    corpus, _ = generate_corpus(300, seed=17)
    r1 = run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    n_winners_1 = r1.metrics["n_winners"]

    extra, _ = generate_corpus(80, seed=99)
    grown = pa.concat_tables([corpus, extra])
    r2 = run_dedup(rd.from_arrow(grown), CFG, checkpoint_dir=ckpt_dir)
    assert r2.metrics["signatures_resumed"] is True
    assert r2.metrics["n_signatures_cached"] == n_winners_1

    fresh = run_dedup(rd.from_arrow(grown), CFG)
    pd.testing.assert_frame_equal(_clusters(r2), _clusters(fresh))


def test_signature_config_change_invalidates(ray_session, ckpt_dir):
    import ray.data as rd
    corpus, _ = generate_corpus(300, seed=17)
    run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    r = run_dedup(rd.from_arrow(corpus),
                  PipelineConfig(shingle_k=5), checkpoint_dir=ckpt_dir)
    assert r.metrics["signatures_resumed"] is False


def test_threshold_change_keeps_checkpoint(ray_session, ckpt_dir):
    """Thresholds are match-time-only (mainwindow.cpp:110-121): the
    signature checkpoint must survive a threshold change."""
    import ray.data as rd
    corpus, _ = generate_corpus(300, seed=17)
    run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    r = run_dedup(rd.from_arrow(corpus),
                  PipelineConfig(threshold_pct=95), checkpoint_dir=ckpt_dir)
    assert r.metrics["signatures_resumed"] is True


def test_rematch_fast_path(ray_session, ckpt_dir):
    """Threshold recalibration (mainwindow.cpp:110-121): rematch() must
    reuse signatures; raising the threshold never grows clusters."""
    import ray.data as rd
    from vidupe_ray.pipelines.dedup import rematch
    corpus, _ = generate_corpus(300, seed=17)
    run_dedup(rd.from_arrow(corpus), CFG, checkpoint_dir=ckpt_dir)
    r95 = rematch(rd.from_arrow(corpus), PipelineConfig(threshold_pct=95),
                  checkpoint_dir=ckpt_dir)
    assert r95.metrics["signatures_resumed"] is True
    r80 = rematch(rd.from_arrow(corpus), PipelineConfig(threshold_pct=80),
                  checkpoint_dir=ckpt_dir)
    # monotone: stricter threshold -> fewer or equal verified pairs
    assert r95.pairs.count() <= r80.pairs.count()


def test_rematch_without_checkpoint_raises(ray_session, tmp_path):
    import ray.data as rd
    from vidupe_ray.pipelines.dedup import rematch
    corpus, _ = generate_corpus(100, seed=3)
    with pytest.raises(ValueError, match="no usable signature checkpoint"):
        rematch(rd.from_arrow(corpus), CFG,
                checkpoint_dir=str(tmp_path / "nothing"))


def test_meta_cache_resume_and_invalidation(ray_session, tmp_path):
    """File-identity docs/membership cache (the reference's
    md5(basename+mtime) key, db.cpp:22-30): an unchanged corpus skips
    normalize + exact dedup on re-run with IDENTICAL clusters; touching a
    source file invalidates the cache."""
    import os
    import time as _time
    import ray.data as rd
    import pandas as pd
    from vidupe_ray.corpus import write_corpus
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup

    cdir = write_corpus(str(tmp_path / "c"), 250, seed=17)
    ck = str(tmp_path / "ck")
    cfg = PipelineConfig(fingerprint_concurrency=2)
    r1 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    c1 = (r1.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    assert r1.metrics["meta_resumed"] is False

    r2 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r2.metrics["meta_resumed"] is True
    assert r2.metrics["signatures_resumed"] is True
    c2 = (r2.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c1, c2)

    # touch one shard -> mtime changes -> cache must NOT be reused
    part = sorted(os.listdir(cdir))[0]
    p = os.path.join(cdir, part)
    os.utime(p, ns=(_time.time_ns(), _time.time_ns() + 1))
    r3 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r3.metrics["meta_resumed"] is False
    c3 = (r3.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c1, c3)


def test_resumable_partitioned_output(ray_session, tmp_path):
    """state.output.resumable_write: partitioned parts with atomic
    completion; a re-run skips finished partitions; a deleted partition
    (simulated crash hole) is re-written; read-back is identical."""
    import os
    import glob
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.state.output import resumable_write, read_partitioned

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"doc_id": rng.permutation(5000).astype("int64"),
                       "v": np.arange(5000, dtype="int64")})
    ds = rd.from_pandas(df).repartition(8)
    d = str(tmp_path / "out")
    m1 = resumable_write(ds, d, "doc_id", buckets=16)
    assert not m1["skipped"].any()
    back = read_partitioned(d).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True),
        df.sort_values("doc_id").reset_index(drop=True))

    m2 = resumable_write(ds, d, "doc_id", buckets=16)
    assert m2["skipped"].all()            # everything already landed

    victim = sorted(glob.glob(os.path.join(d, "part-*.parquet")))[3]
    os.remove(victim)                      # crash hole
    m3 = resumable_write(ds, d, "doc_id", buckets=16)
    assert (~m3["skipped"]).sum() == 1     # only the hole was re-written
    back3 = read_partitioned(d).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        back3.reset_index(drop=True),
        df.sort_values("doc_id").reset_index(drop=True))


def test_signature_fast_path_and_corpus_change_safety(ray_session, tmp_path):
    """Fast path: an unchanged corpus re-run reads the signature
    checkpoint with no filters (signatures_fast_path).  Safety: after the
    corpus CHANGES, the superset checkpoint must never be fast-pathed —
    stale signatures of removed docs must not reach LSH."""
    import os
    import ray.data as rd
    import pandas as pd
    from vidupe_ray.corpus import write_corpus
    from vidupe_ray.config import PipelineConfig
    from vidupe_ray.pipelines.dedup import run_dedup

    cdir = write_corpus(str(tmp_path / "A"), 260, seed=21)
    ck = str(tmp_path / "ck")
    cfg = PipelineConfig(fingerprint_concurrency=2)
    r1 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r1.metrics["signatures_fast_path"] is False
    r2 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r2.metrics["signatures_fast_path"] is True
    c1 = (r1.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    c2 = (r2.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c1, c2)

    # corpus change: drop a shard -> fewer docs; superset checkpoint must
    # go through the validity filter, and results must equal a fresh run
    parts = sorted(os.listdir(cdir))
    os.remove(os.path.join(cdir, parts[0]))
    r3 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r3.metrics["signatures_fast_path"] is False
    fresh = run_dedup(rd.read_parquet(cdir), cfg)    # no checkpoint
    c3 = (r3.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    cf = (fresh.clusters.to_pandas()[["doc_id", "cluster_id"]]
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(c3, cf)
    # and the shrunken corpus never regains the unsafe fast path
    r4 = run_dedup(rd.read_parquet(cdir), cfg, checkpoint_dir=ck)
    assert r4.metrics["signatures_fast_path"] is False


def test_resumable_output_identity_wipes_stale(ray_session, tmp_path):
    """ADVICE r2: a re-run into the same out_dir with a DIFFERENT run
    identity (corpus/config changed) must wipe the stale partitions, not
    mix them with fresh ones; same identity keeps the skip fast path and
    skipped rows report the EXISTING file's row count."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.state.output import resumable_write, read_partitioned

    d = str(tmp_path / "out")
    df1 = pd.DataFrame({"doc_id": np.arange(100, dtype="int64"),
                        "v": np.ones(100, dtype="int64")})
    m1 = resumable_write(rd.from_pandas(df1), d, "doc_id", buckets=4,
                         identity="runA")
    assert not m1["skipped"].any()

    # same identity, different (bigger) dataset -> partitions are SKIPPED
    # and the manifest reports what's actually on disk (df1's 100 rows)
    df2 = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                        "v": np.zeros(200, dtype="int64")})
    m2 = resumable_write(rd.from_pandas(df2), d, "doc_id", buckets=4,
                         identity="runA")
    assert m2["skipped"].all()
    assert int(m2["rows"].sum()) == 100

    # changed identity -> stale parts wiped, df2 fully written
    m3 = resumable_write(rd.from_pandas(df2), d, "doc_id", buckets=4,
                         identity="runB")
    assert not m3["skipped"].any()
    back = read_partitioned(d).to_pandas()
    assert len(back) == 200
    assert (back.sort_values("doc_id")["v"].to_numpy() == 0).all()


def test_pair_cursor_resumes_mid_iteration(ray_session, tmp_path):
    """Entry point 2 analogue (comparison.cpp:79-126): walking the
    verified pairs in stable (a, b) order survives a mid-list death —
    a fresh cursor over the same dataset continues after the last
    acknowledged pair, the union covers every pair exactly once."""
    import pandas as pd
    import ray.data as rd
    from vidupe_ray.state.cursor import (iter_pairs_resumable,
                                         load_cursor, clear_cursor)
    rows = pd.DataFrame({
        "a": [5, 1, 3, 1, 9, 3, 7],
        "b": [6, 2, 8, 9, 11, 4, 8],
        "kind": ["near"] * 7,
    })
    ds = rd.from_pandas(rows)
    ckpt = str(tmp_path)
    it = iter_pairs_resumable(ds, ckpt, batch_size=2)
    first = [next(it) for _ in range(3)]          # consumer dies here
    del it
    assert load_cursor(ckpt) is not None
    rest = list(iter_pairs_resumable(ds, ckpt, batch_size=2))
    got = [(r["a"], r["b"]) for r in first + rest]
    want = sorted(zip(rows["a"], rows["b"]))
    # auto_ack advances when the consumer requests the NEXT item, so the
    # cursor records pair #2 and resume re-delivers pair #3 exactly once
    # (at-least-once delivery; verdict application is idempotent, like
    # the reference's DB writes)
    assert got == want[:3] + want[2:]
    assert sorted(set(got)) == want
    clear_cursor(ckpt)
    fresh = [(r["a"], r["b"])
             for r in iter_pairs_resumable(ds, ckpt, batch_size=3)]
    assert fresh == want
