"""Normalize stage — stateless ``map_batches`` tasks.

The analogue of ``getMetadata`` + rotation normalize + validity filter
(``video.cpp:47-120``, ``video.cpp:31-35``): pure per-row derivation of
identity, hashes and counters, plus the canonical text every later stage
consumes.  Rows are never dropped here — invalid rows are *tagged*
(``status != 'ok'``) and routed to the rejects dataset, mirroring
``_rejectedVideos`` (``mainwindow.cpp:307-315``).

Input  schema: repo, path, commit, lang, content [, doc_id]
Output schema: repo, path, commit, lang, doc_id, mtime, sha256,
               sha256_canon, n_bytes, n_lines, status [, content_canon]

``sha256`` (of the RAW content) is the per-row invariant required by
``BASELINE.json::input_hint``; ``sha256_canon`` (of the canonical form) is
the exact-dedup key — the cache-key idea of ``db.cpp:22-30`` (identity that
survives presentation changes) taken one step further.

By default the canonical TEXT is not emitted — only its hash.  The
metadata table is then tiny (pins cheaply for its three consumers) and the
wide content never enters the object store: downstream stages re-read
content from the source and re-canonicalize on the fly (recompute beats
shipping at corpus scale).  Pass ``emit_canonical=True`` to keep the
column when the caller needs it directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.text import canonicalize, doc_id_for

STATUS_OK = "ok"
STATUS_EMPTY = "empty"          # F2 analogue: width==0 -> reject (video.cpp:31-35)


def batch_doc_ids(batch: pa.Table) -> np.ndarray:
    """Stable per-row doc ids: the existing ``doc_id`` column when present
    (adapter inputs), else the identity-key hash."""
    n = batch.num_rows
    if "doc_id" in batch.column_names:
        return batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    return np.fromiter(
        (doc_id_for(r, p, c) for r, p, c in zip(repo, path, commit)),
        dtype=np.int64, count=n)


def normalize_batch(batch: pa.Table, cfg: PipelineConfig | None = None,
                    emit_canonical: bool = False,
                    impl: str = "python") -> pa.Table:
    """Batch normalize with two bit-identical implementations:

    - ``impl="python"`` (DEFAULT, measured): per-row C-speed primitives —
      hashlib sha256, the canonicalize regex, str ops.  MEASURED at
      500k docs on the bench box: 14.8 s @ 8 cpus -> 5.2 s @ 32 (2.85x).
    - ``impl="bytes"``: byte-level vectorized canonicalization over the
      Arrow buffer (``functions/bytetext.py``; property-tested equal).
      MEASURED: 21.6 s @ 8 cpus -> 129 s @ 32 — the ~10 large ndarray
      temporaries per batch ANTI-SCALE on this single-memory-controller
      box (page-zeroing/TLB-shootdown collapse; BASELINE.md 'normalize
      impl shootout').  Kept selectable for hardware where large-array
      streaming wins, and as the buffer-level reference.
    """
    n = batch.num_rows
    doc_ids = batch_doc_ids(batch)

    if impl == "bytes":
        from ..functions import bytetext as BT
        col = batch.column("content")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = BT.normalize_hashes(col, return_canonical=emit_canonical)
        sha_raw = h["sha256"]
        sha_canon = h["sha256_canon"]
        n_bytes = h["n_bytes"]
        n_lines = h["n_lines"]
        status = np.where(h["status"] == "ok", STATUS_OK, STATUS_EMPTY)
        canon_col = h.get("content_canon")
    else:
        content = batch.column("content").to_pylist()
        sha_raw = np.empty(n, dtype=object)
        sha_canon = np.empty(n, dtype=object)
        canon = np.empty(n, dtype=object)
        n_bytes = np.empty(n, dtype=np.int64)
        n_lines = np.empty(n, dtype=np.int64)
        status = np.empty(n, dtype=object)
        for i, text in enumerate(content):
            text = text if text is not None else ""
            raw_b = text.encode("utf-8", "surrogatepass")
            sha_raw[i] = hashlib.sha256(raw_b).hexdigest()
            c = canonicalize(text)
            canon[i] = c
            # already-canonical files reuse the raw digest
            sha_canon[i] = (sha_raw[i] if c == text else hashlib.sha256(
                c.encode("utf-8", "surrogatepass")).hexdigest())
            n_bytes[i] = len(raw_b)
            n_lines[i] = c.count("\n") + 1 if c else 0
            status[i] = STATUS_OK if c else STATUS_EMPTY
        canon_col = pa.array(canon, pa.large_string()) \
            if emit_canonical else None

    cols = {
        "repo": batch.column("repo") if "repo" in batch.column_names
                else pa.array([""] * n, pa.string()),
        "path": batch.column("path") if "path" in batch.column_names
                else pa.array([""] * n, pa.string()),
        "commit": batch.column("commit") if "commit" in batch.column_names
                  else pa.array([""] * n, pa.string()),
        "lang": batch.column("lang") if "lang" in batch.column_names
                else pa.array([""] * n, pa.string()),
        "doc_id": pa.array(doc_ids, pa.int64()),
        # mtime feeds the canonical pick (comparison.cpp:266-330 ranking);
        # sources without one get 0 (rank falls through to doc_id)
        "mtime": (batch.column("mtime")
                  if "mtime" in batch.column_names
                  else pa.array(np.zeros(n, np.int64), pa.int64())),
        "sha256": pa.array(sha_raw, pa.string()),
        "sha256_canon": pa.array(sha_canon, pa.string()),
        "n_bytes": pa.array(np.asarray(n_bytes, np.int64), pa.int64()),
        "n_lines": pa.array(np.asarray(n_lines, np.int64), pa.int64()),
        "status": pa.array(status, pa.string()),
    }
    if emit_canonical:
        cols["content_canon"] = canon_col
    return pa.table(cols)


def apply_lang_filter(batch: pa.Table, allowlist: tuple) -> pa.Table:
    """extensions.ini analogue (``mainwindow.cpp:74-93``): keep allowed langs."""
    import pyarrow.compute as pc
    if not allowlist:
        return batch
    return batch.filter(pc.is_in(batch.column("lang"),
                                 value_set=pa.array(allowlist)))
