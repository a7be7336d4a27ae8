"""Multimodal columns — image/audio/video payloads as opaque ``binary``
columns with typed metadata (task brief: the Ray-side plumbing is real and
tested; the codec work is stubbed because no media libraries exist in this
container).

This mirrors the reference's actual domain (video files -> ffmpeg decode ->
frame features, ``video.cpp:122-228``): the decode step is an external
dependency there too (ffmpeg subprocess, ``video.cpp:265-282``); here it is
an actor-pool stage whose ``_decode`` is either a clearly-marked
NotImplementedError (strict mode) or a deterministic fake (test mode), while
batch sizing, schema, actor signature and output layout are production-real.

Schema in:  doc_id:int64, media:binary, media_type:string
Schema out: doc_id:int64, media_type:string, n_bytes:int64,
            feature:fixed_size_list<float,dim>, status:string
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 64

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media", pa.binary()),
    ("media_type", pa.string()),
])


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract media payloads.

    Use small ``batch_size`` (payloads are wide) and
    ``concurrency=(min,max)`` sized to the node; the real decoder state
    (codec contexts / model weights) belongs in ``__init__`` — exactly the
    pattern the fingerprint stage uses for its hash families.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 fake_decode: bool = True):
        self.feature_dim = feature_dim
        self.fake_decode = fake_decode
        # real implementation would load codec/model state here, once

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        """STUB: media decoding needs image/audio libraries that are not in
        this container.  ``fake_decode`` derives a deterministic feature
        vector from the payload bytes so the distributed plumbing (schema,
        batching, actor lifecycle, downstream ANN) is fully exercisable."""
        if not self.fake_decode:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg/torchaudio — not "
                "available in this environment; construct with "
                "fake_decode=True for plumbing tests")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.feature_dim * 4) // len(h) + 1))
                            [:self.feature_dim * 4], dtype=np.uint32)
        v = (raw.astype(np.float64) / 2**32) - 0.5
        return (v / np.linalg.norm(v)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("media").to_pylist()
        types = batch.column("media_type").to_pylist()
        n = len(payloads)
        feats = np.zeros((n, self.feature_dim), dtype=np.float32)
        status = []
        n_bytes = np.zeros(n, dtype=np.int64)
        for i, (p, t) in enumerate(zip(payloads, types)):
            if p is None or len(p) == 0:
                status.append("empty")
                continue
            n_bytes[i] = len(p)
            try:
                feats[i] = self._decode(p, t)
                status.append("ok")
            except NotImplementedError:
                status.append("decoder_unavailable")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()),
                self.feature_dim),
            "status": pa.array(status, pa.string()),
        })


def extract_media_features(ds, concurrency=2, batch_size: int = 64,
                           fake_decode: bool = True):
    """Media features via an actor pool — small batches because payloads
    are wide (the memory-guard lesson of ``video.h:56-58``)."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
