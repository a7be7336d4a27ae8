"""Signature checkpointing — the ``cache.db`` analogue (``db.cpp:32-77``).

The reference caches per-video metadata + captures in SQLite keyed by
``md5(basename + mtime)`` with a ``version`` table guarding compatibility
(``db.cpp:22-30``, ``db.cpp:46-47``); a re-run only computes what is
missing (">10x faster loading once cached", readme.md:35).

Here the unit of caching is the DOCUMENT, like the reference — not the
run.  The fingerprint stage writes signature parquet under
``<dir>/signatures/<signature_config_hash>/data/``; on the next run:

- cached rows whose doc_id is still a winner are reused as-is,
- only the DELTA (new/changed winners) is fingerprinted,
- the delta is appended as new part files (resumable after a mid-run
  kill: whatever was flushed is reused, the rest recomputed).

A signature-config change lands in a different directory, so stale
entries are never read (the ``version``-table semantic); thresholds are
deliberately NOT part of the key (match-time-only parameters,
``mainwindow.cpp:110-121``).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_MANIFEST = "MANIFEST.json"


def _sig_dir(checkpoint_dir: str, cfg) -> str:
    return os.path.join(checkpoint_dir, "signatures",
                        cfg.signature_config_hash)


def _data_dir(checkpoint_dir: str, cfg) -> str:
    return os.path.join(_sig_dir(checkpoint_dir, cfg), "data")


def cached_doc_ids_ds(checkpoint_dir: str, cfg):
    """doc_id-column dataset of the signature checkpoint, or ``None`` when
    no checkpoint exists.

    The checkpoint probe costs one slim column scan — and the id set is
    never collected on the driver (it is ≈ the corpus; the resume joins
    run through sharded key refs, state/joins.py)."""
    d = _data_dir(checkpoint_dir, cfg)
    if not glob.glob(os.path.join(d, "*.parquet")):
        return None
    return rd.read_parquet(d, columns=["doc_id"])


def cached_doc_ids(checkpoint_dir: str, cfg) -> np.ndarray:
    """Sorted doc_ids present in the signature checkpoint (empty if none).
    Small-scale/test convenience — the resume path itself streams the ids
    (``cached_doc_ids_ds``) instead of collecting them."""
    ds = cached_doc_ids_ds(checkpoint_dir, cfg)
    if ds is None:
        return np.empty(0, dtype=np.int64)
    parts = [b["doc_id"].to_numpy()
             for b in ds.iter_batches(batch_size=1 << 20,
                                      batch_format="pandas")]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def _read_manifest(checkpoint_dir: str, cfg) -> dict:
    p = os.path.join(_sig_dir(checkpoint_dir, cfg), _MANIFEST)
    if not os.path.exists(p):
        return {}
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def resume_signatures(winners_ds, checkpoint_dir: str, cfg,
                      fingerprint_fn, corpus_key: str | None = None) -> tuple:
    """Per-document incremental resume.

    ``fingerprint_fn(ds) -> signatures_ds`` fingerprints a winner subset.
    Returns ``(signatures_ds, n_cached, n_computed_hint)`` where the
    signatures dataset is the union of reused cached rows (still-valid
    winners only) and the freshly computed delta; the delta is persisted
    before returning, so a later kill never loses it.

    FAST PATH: when the manifest records that this checkpoint is COMPLETE
    for exactly ``corpus_key`` (the file-identity key — previous run wrote
    signatures for precisely this corpus's winners), the checkpoint is
    read back directly — no corpus scan, no id filters at all (measured
    at 2M docs: the validity filters cost more than recomputing).  The
    manifest is deleted before any delta append and rewritten after, so
    a mid-run kill can only downgrade to the safe slow path.

    Slow path: the cached-id set is ≈ the corpus, so it is never
    collected on the driver — both resume joins (winner \\ cached ->
    delta; cached ∩ winner -> reuse) run through sharded key refs
    (state/joins.py), one shard of ids in driver memory at a time.
    """
    from .joins import filter_by_key_shards, sharded_key_refs
    from ..stages.normalize import batch_doc_ids

    d = _data_dir(checkpoint_dir, cfg)
    os.makedirs(d, exist_ok=True)
    # sweep scratch dirs left by killed runs (their parts never reached
    # data/, so they are dead weight)
    import shutil
    for stale in glob.glob(os.path.join(_sig_dir(checkpoint_dir, cfg),
                                        "tmp-*")):
        shutil.rmtree(stale, ignore_errors=True)

    man = _read_manifest(checkpoint_dir, cfg)
    if (corpus_key is not None and man.get("complete")
            and man.get("corpus_key") == corpus_key
            and glob.glob(os.path.join(d, "*.parquet"))):
        sigs = rd.read_parquet(d)
        return sigs, sigs.count(), -1          # -1: fast path marker

    cached_ds = cached_doc_ids_ds(checkpoint_dir, cfg)
    n_cached = cached_ds.count() if cached_ds is not None else 0
    cached_buckets = (1 if n_cached <= cfg.broadcast_cap
                      else cfg.join_buckets)
    cached_refs = (sharded_key_refs(cached_ds, "doc_id", cached_buckets)
                   if n_cached else
                   [ray.put(np.empty(0, dtype=np.int64))])

    def _ensure_ids(batch: pa.Table) -> pa.Table:
        if "doc_id" not in batch.column_names:
            batch = batch.append_column(
                "doc_id", pa.array(batch_doc_ids(batch), pa.int64()))
        return batch

    with_ids = winners_ds.map_batches(_ensure_ids, batch_format="pyarrow")
    missing = filter_by_key_shards(with_ids, "doc_id", cached_refs,
                                   invert=True)
    delta = fingerprint_fn(missing)

    # invalidate the manifest BEFORE appending: a kill mid-append leaves
    # no manifest -> next run takes the safe slow path, never a fast-path
    # read of a superset directory
    try:
        os.remove(os.path.join(_sig_dir(checkpoint_dir, cfg), _MANIFEST))
    except OSError:
        pass

    # persist the delta as NEW part files: write to a scratch dir, then
    # atomically rename each finished part in — a mid-run kill leaves only
    # an ignorable scratch dir, never a truncated parquet in data/
    import uuid
    tmp = os.path.join(_sig_dir(checkpoint_dir, cfg),
                       f"tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    delta.write_parquet(tmp)
    n_delta_files = 0
    for p in glob.glob(os.path.join(tmp, "*.parquet")):
        os.rename(p, os.path.join(
            d, f"delta-{uuid.uuid4().hex[:8]}-{os.path.basename(p)}"))
        n_delta_files += 1
    os.rmdir(tmp)

    if n_cached == 0:
        sigs = rd.read_parquet(d)
        # fresh dir == exactly this corpus's winner signatures -> the
        # next unchanged-corpus run may read it back without any filter
        _write_manifest(checkpoint_dir, cfg, corpus_key=corpus_key,
                        complete=corpus_key is not None)
        return sigs, 0, n_delta_files

    # reuse cached rows, but only those that are STILL winners (a changed
    # input may have demoted some cached docs) — winner-id side streamed
    # through sharded refs exactly like the cached side
    all_sigs = rd.read_parquet(d)
    winner_ids = with_ids.select_columns(["doc_id"])
    n_w = winner_ids.count()
    w_buckets = 1 if n_w <= cfg.broadcast_cap else cfg.join_buckets
    w_refs = sharded_key_refs(winner_ids, "doc_id", w_buckets)
    sigs = filter_by_key_shards(all_sigs, "doc_id", w_refs)
    # delta resume: the directory is a SUPERSET of this corpus's winners
    # (it may hold signatures of since-removed docs) -> never fast-path it
    _write_manifest(checkpoint_dir, cfg, corpus_key=corpus_key,
                    complete=False)
    return sigs, n_cached, n_delta_files


def _write_manifest(checkpoint_dir: str, cfg, corpus_key=None,
                    complete=False):
    with open(os.path.join(_sig_dir(checkpoint_dir, cfg), _MANIFEST),
              "w") as f:
        json.dump({"config_hash": cfg.signature_config_hash,
                   "corpus_key": corpus_key, "complete": bool(complete)},
                  f)


def corpus_cache_key(corpus_ds, cfg) -> str | None:
    """Identity key of a FILE-BACKED corpus: sha256 over the sorted
    (path, size, mtime) list of its source files plus the config fields
    that shape the metadata pass (lang allowlist).

    This is the direct analogue of the reference's cache key
    ``md5(basename + mtime)`` (``db.cpp:22-30``) — file-level identity,
    no content scan.  ``None`` for in-memory datasets (nothing stable to
    key on)."""
    try:
        files = corpus_ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    import hashlib
    h = hashlib.sha256()
    try:
        for f in sorted(files):
            st = os.stat(f)
            h.update(f"{f}\x00{st.st_size}\x00{st.st_mtime_ns}\n".encode())
    except OSError:
        return None
    h.update(repr(tuple(cfg.lang_allowlist)).encode())
    h.update(b"schema-v2")   # docs_meta gained mtime in round 4; older
    return h.hexdigest()[:16]  # cached metadata must not resurface


def _meta_dir(checkpoint_dir: str, key: str, what: str) -> str:
    return os.path.join(checkpoint_dir, what, key)


def load_meta_cache(checkpoint_dir: str, key: str | None, what: str):
    """Cached ``docs`` / ``membership`` dataset for this corpus key, or
    ``None``."""
    if key is None:
        return None
    d = _meta_dir(checkpoint_dir, key, what)
    if not glob.glob(os.path.join(d, "*.parquet")):
        return None
    return rd.read_parquet(d)


def save_meta_cache(checkpoint_dir: str, key: str | None, what: str, ds):
    """Atomically persist a (tiny) metadata dataset: write to scratch,
    rename parts in — a mid-run kill never leaves a truncated cache."""
    if key is None:
        return
    import shutil
    import uuid
    d = _meta_dir(checkpoint_dir, key, what)
    parent = os.path.dirname(d)
    os.makedirs(parent, exist_ok=True)
    for stale in glob.glob(os.path.join(parent, "tmp-*")):
        shutil.rmtree(stale, ignore_errors=True)
    tmp = os.path.join(parent, f"tmp-{uuid.uuid4().hex[:8]}")
    ds.write_parquet(tmp)
    if os.path.isdir(d):        # already cached by a concurrent run
        shutil.rmtree(tmp, ignore_errors=True)
        return
    os.rename(tmp, d)


def write_lineage(checkpoint_dir: str, stage: str, record: dict):
    """Append one lineage/metrics record (JSONL) — the status-log sink
    analogue (``mainwindow.cpp:292-296``), structured."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps({"stage": stage, **record}) + "\n")
