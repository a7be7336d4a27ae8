"""Fingerprint stage — stateful actor pool.

The analogue of ``Video::run``'s capture+hash phase
(``takeScreenCaptures`` -> ``processThumbnail`` -> ``computePhash``,
``video.cpp:122-228``), recast as one vectorized Arrow-batch transform:

- per-actor state built ONCE in ``__init__`` (the 128 MinHash (a,b) params
  and shingle-window coefficients) — the static-Prefs / shared-DCT-state
  pattern (``video.cpp:4-11``, SURVEY.md §2.4 T3);
- per-batch work fully vectorized over the concatenated shingle stream;
- low-content guard: docs with fewer than ``min_shingles`` shingles get
  zero SimHash slots and are excluded from near-dup candidate generation,
  exactly like the monochrome reject sets hash=0 (``video.cpp:203-211``)
  while staying exact-dup eligible.

Input:  raw winner rows (content [+ doc_id]) — or normalize output with
        ``emit_canonical=True`` for callers that pre-canonicalized.
Output: doc_id, lang, n_bytes, n_tokens, n_shingles, simhash, simhash_head,
        simhash_tail, minhash (fixed_size_list<uint64, P>), anchors
        (list<uint64>), low_content (bool).  Content is DROPPED here —
        only signatures flow into the shuffles (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import hashing as H
from ..functions.text import tokenize


class FingerprintActor:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # NO canonicalization needed for tokens: \w+ tokens are
        # whitespace/line-ending invariant, so raw and canonical text
        # tokenize identically (property-tested); the canonical form is
        # only ever needed for hashing (normalize) and the substring
        # confirm.
        content_col = ("content_canon"
                       if "content_canon" in batch.column_names
                       else "content")
        if "doc_id" in batch.column_names and content_col == "content_canon":
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            n_bytes = batch.column("n_bytes").to_numpy(zero_copy_only=False)
        else:
            from .normalize import batch_doc_ids
            doc_ids = batch_doc_ids(batch)
            arr = batch.column(content_col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            import pyarrow.compute as pc
            n_bytes = pc.binary_length(
                pc.fill_null(arr, "").cast(pa.binary())
            ).to_numpy(zero_copy_only=False).astype(np.int64)

        if cfg.tokenizer == "bytes":
            th, off = H.byte_tokenize_hash(batch.column(content_col),
                                           cfg.seed)
        else:
            raw = batch.column(content_col).to_pylist()
            token_lists = [tokenize(t if t is not None else "")
                           for t in raw]
            th, off = H.hash_token_lists(token_lists)
        sh, sh_off = H.shingles_from_tokens(th, off, cfg.shingle_k, cfg.seed)

        n_tokens = np.diff(off).astype(np.int64)
        n_shingles = np.diff(sh_off).astype(np.int64)
        low = n_shingles < cfg.min_shingles

        minhash = H.minhash_signatures_cfg(sh, sh_off, cfg)
        # cache-resident per-doc slot computation (see simhash_doc_slots)
        simhash, head, tail = H.simhash_doc_slots(sh, sh_off,
                                                  cfg.head_tail_window)
        # monochrome-reject analogue: zero out sketches of low-content docs
        simhash[low] = H.U64(0)
        head[low] = H.U64(0)
        tail[low] = H.U64(0)

        a_values, a_offsets = H.bottom_k_distinct(sh, sh_off, cfg.anchor_k)
        if low.any():
            keep = np.repeat(~low, np.diff(a_offsets))
            a_counts = np.diff(a_offsets)
            a_counts[low] = 0
            a_values = a_values[keep]
            a_offsets = np.concatenate([[0], np.cumsum(a_counts)])

        n = batch.num_rows
        P = cfg.num_perms
        out = pa.table({
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64),
                               pa.int64()),
            "lang": batch.column("lang"),
            "n_bytes": pa.array(np.asarray(n_bytes, dtype=np.int64),
                                pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_shingles": pa.array(n_shingles, pa.int64()),
            "simhash": pa.array(simhash, pa.uint64()),
            "simhash_head": pa.array(head, pa.uint64()),
            "simhash_tail": pa.array(tail, pa.uint64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(minhash.reshape(-1), pa.uint64()), P),
            "anchors": pa.ListArray.from_arrays(
                pa.array(a_offsets, pa.int32()),
                pa.array(a_values, pa.uint64())),
            "low_content": pa.array(low, pa.bool_()),
        })
        return out


# per-worker-process cache: the 'stateful setup once per worker' pattern
# realized for STATELESS Ray tasks — Ray reuses worker processes, so the
# hash-family state is built once per process just like an actor __init__,
# without paying 30 fresh actor-process spawns per run.  Use mode='actors'
# (cfg.fingerprint_mode) when per-worker state is heavy (models); for the
# ~KB hash params, tasks schedule strictly better (measured 6.8s vs 14s
# for 50k docs on 32 CPUs).
_PROCESS_CACHE: dict = {}


def _cached_fingerprinter(cfg: PipelineConfig) -> FingerprintActor:
    key = (cfg.signature_config_hash, cfg.num_perms)
    fp = _PROCESS_CACHE.get(key)
    if fp is None:
        fp = FingerprintActor(cfg)
        _PROCESS_CACHE[key] = fp
    return fp


def fingerprint_dataset(ds, cfg: PipelineConfig):
    """Apply the fingerprint stage with the configured execution mode."""
    if cfg.fingerprint_mode == "actors":
        return ds.map_batches(
            FingerprintActor, fn_constructor_args=(cfg,),
            batch_format="pyarrow", batch_size=cfg.batch_size,
            concurrency=cfg.fingerprint_concurrency)

    def _fp(batch: pa.Table) -> pa.Table:
        return _cached_fingerprinter(cfg)(batch)

    return ds.map_batches(_fp, batch_format="pyarrow",
                          batch_size=cfg.batch_size)


def signatures_schema(cfg: PipelineConfig) -> pa.Schema:
    return pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_bytes", pa.int64()), ("n_tokens", pa.int64()),
        ("n_shingles", pa.int64()), ("simhash", pa.uint64()),
        ("simhash_head", pa.uint64()), ("simhash_tail", pa.uint64()),
        ("minhash", pa.list_(pa.uint64(), cfg.num_perms)),
        ("anchors", pa.list_(pa.uint64())), ("low_content", pa.bool_()),
    ])
