"""Byte-level canonicalization + hashing over Arrow string buffers.

The normalize stage's hot loop without a single Python string: the
canonical transform (``functions/text.canonicalize``) re-expressed as
vectorized byte masks over the concatenated UTF-8 buffer, producing
exactly ``canonicalize(text).encode()`` per document (property-tested),
plus per-doc sha256 of raw and canonical bytes (hashlib over buffer
slices — C speed, no decode/encode round-trips).

Canonical rules (must stay bit-identical to the string implementation):
1. CRLF -> LF, lone CR -> LF
2. every run of [ \\t \\f \\v] collapses to one space
3. spaces adjacent to line starts/ends are stripped
4. trailing newline runs (trailing blank lines + final EOL) are dropped
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_HWS = np.zeros(256, dtype=bool)         # horizontal whitespace
for _c in (0x20, 0x09, 0x0C, 0x0B):
    _HWS[_c] = True
_CR, _LF, _SP = 0x0D, 0x0A, 0x20


def _string_parts(arr) -> tuple:
    import pyarrow.compute as pc
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    ndocs = len(arr)
    off_dtype = (np.int64 if pa.types.is_large_string(arr.type)
                 else np.int32)
    offs_full = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
    offs = offs_full[arr.offset:arr.offset + ndocs + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.empty(0, dtype=np.uint8))
    lo = offs[0]
    return data[lo:offs[-1]], offs - lo, ndocs


def _doc_counts(mask: np.ndarray, doc_off: np.ndarray) -> np.ndarray:
    """Kept-byte count per doc: prefix-sum difference (empty-doc safe,
    no reduceat duplicate-index pitfalls).  One int32 temp."""
    csum = np.cumsum(mask, dtype=np.int32)
    s = np.concatenate([[0], csum])
    return (s[doc_off[1:]] - s[doc_off[:-1]]).astype(np.int64)


_CANON_CHUNK = 1 << 16             # 64 KiB of text per chunk: every mask /
                                   # prefix-sum temporary stays L2-resident
                                   # (same recipe as the tokenizer chunking
                                   # — whole-batch temporaries anti-scale
                                   # 32-way on this box, BASELINE.md)


def canonical_bytes(arr) -> tuple:
    """Arrow string array -> (canon_bytes: uint8[N'], canon_offsets,
    raw_offsets, raw_bytes) with canon == canonicalize(text).encode().

    DRAM-budget notes: everything runs by boolean COMPRESSION (``a[mask]``)
    and small-dtype prefix sums — no int64 index arrays, no searchsorted
    over the byte space — and the buffer is processed in doc-aligned
    ~64 KiB chunks so the temporaries never leave cache.  (The
    whole-batch variants of both decisions were built and MEASURED to
    anti-scale at 32-way — flatnonzero/searchsorted v1, whole-batch-mask
    v2; see BASELINE.md 'normalize impl shootout'.)
    """
    b, doc_off, ndocs = _string_parts(arr)
    n = len(b)
    if n == 0:
        z = np.zeros(ndocs + 1, dtype=np.int64)
        return np.empty(0, np.uint8), z, doc_off, b

    canon_parts = []
    counts_all = np.zeros(ndocs, dtype=np.int64)
    d0 = 0
    while d0 < ndocs:
        d1 = int(np.searchsorted(doc_off, doc_off[d0] + _CANON_CHUNK,
                                 side="left"))
        d1 = min(max(d1, d0 + 1), ndocs)
        cb, cnts = _canonical_span(b, doc_off, d0, d1)
        if len(cb):
            canon_parts.append(cb)
        counts_all[d0:d1] = cnts
        d0 = d1
    canon = (np.concatenate(canon_parts) if canon_parts
             else np.empty(0, np.uint8))
    canon_off = np.concatenate(
        [[0], np.cumsum(counts_all)]).astype(np.int64)
    return canon, canon_off, doc_off, b


def _canonical_span(b_full: np.ndarray, doc_off_full: np.ndarray,
                    dlo: int, dhi: int) -> tuple:
    """Canonical bytes + per-doc counts for docs [dlo, dhi) — every
    temporary sized to the span."""
    lo, hi = int(doc_off_full[dlo]), int(doc_off_full[dhi])
    ndocs = dhi - dlo
    n = hi - lo
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(ndocs, dtype=np.int64)
    b = b_full[lo:hi]
    doc_off = doc_off_full[dlo:dhi + 1] - lo

    # --- step 1: CRLF/CR -> LF ------------------------------------------
    work = b.copy()
    cr = work == _CR
    nxt_lf = np.empty(n, dtype=bool)
    nxt_lf[-1] = False
    np.equal(work[1:], _LF, out=nxt_lf[:-1])
    # a CR directly before an LF *within the same doc* is dropped
    ends = doc_off[1:] - 1
    last_of_doc = np.zeros(n, dtype=bool)
    last_of_doc[ends[ends >= 0]] = True
    drop_cr = cr & nxt_lf & ~last_of_doc
    keep = ~drop_cr
    work[cr & keep] = _LF                     # lone CR -> LF

    # --- step 2: collapse horizontal-ws runs to one space ----------------
    hws = _HWS[work]
    hws &= keep
    prev_hws = np.empty(n, dtype=bool)
    prev_hws[0] = False
    prev_hws[1:] = hws[:-1]
    start_of_doc = np.zeros(n, dtype=bool)
    start_of_doc[doc_off[:-1][doc_off[:-1] < n]] = True
    run_start = hws & (~prev_hws | start_of_doc)
    keep &= ~(hws & ~run_start)
    work[run_start] = _SP

    # --- compress 1 ------------------------------------------------------
    counts1 = _doc_counts(keep, doc_off)
    ks = work[keep]
    m = len(ks)
    off1 = np.concatenate([[0], np.cumsum(counts1)]).astype(np.int64)

    # --- step 3: strip spaces at line edges (compressed space) -----------
    new_doc = np.zeros(m, dtype=bool)
    new_doc[off1[:-1][counts1 > 0]] = True
    is_sp = ks == _SP
    prev_lf = np.empty(m, dtype=bool)
    prev_lf[0] = True
    np.equal(ks[:-1], _LF, out=prev_lf[1:])
    prev_lf |= new_doc                        # doc start acts like LF
    next_lf = np.empty(m, dtype=bool)
    next_lf[-1] = True
    np.equal(ks[1:], _LF, out=next_lf[:-1])
    next_lf[:-1] |= new_doc[1:]               # doc end acts like LF
    keep2 = ~(is_sp & (prev_lf | next_lf))

    counts2 = _doc_counts(keep2, off1)
    ks2 = ks[keep2]
    m2 = len(ks2)
    off2 = np.concatenate([[0], np.cumsum(counts2)]).astype(np.int64)

    # --- step 4: drop trailing newline runs (compressed space) -----------
    if m2:
        is_lf = ks2 == _LF
        pos = np.arange(m2, dtype=np.int64)
        pos_or_neg = np.where(is_lf, np.int64(-1), pos)
        last_nonlf = np.full(ndocs, -1, dtype=np.int64)
        live = counts2 > 0
        if live.any():
            last_nonlf[live] = np.maximum.reduceat(
                pos_or_neg, off2[:-1][live])
        keep3 = ~(is_lf & (pos > np.repeat(last_nonlf, counts2)))
        counts3 = _doc_counts(keep3, off2)
        canon = ks2[keep3]
    else:
        counts3 = np.zeros(ndocs, dtype=np.int64)
        canon = ks2

    return canon, counts3


def normalize_hashes(arr, return_canonical: bool = False) -> dict:
    """Per-doc raw/canonical sha256 hex + counters, all from buffers.

    ``return_canonical=True`` additionally returns the canonical text as a
    zero-copy ``large_string`` Arrow array built directly from the
    canonical byte buffer (``canon`` / ``canon_offsets`` keys feed it)."""
    canon, c_off, r_off, raw = canonical_bytes(arr)
    ndocs = len(c_off) - 1
    sha_raw = [hashlib.sha256(raw[r_off[d]:r_off[d + 1]]).hexdigest()
               for d in range(ndocs)]
    # most source files are already canonical: a memcmp (≈10x cheaper than
    # sha256) decides whether the raw digest can be reused
    sha_canon = [
        sha_raw[d]
        if (c_off[d + 1] - c_off[d] == r_off[d + 1] - r_off[d]
            and np.array_equal(canon[c_off[d]:c_off[d + 1]],
                               raw[r_off[d]:r_off[d + 1]]))
        else hashlib.sha256(canon[c_off[d]:c_off[d + 1]]).hexdigest()
        for d in range(ndocs)]
    n_bytes = np.diff(r_off).astype(np.int64)
    c_counts = np.diff(c_off)
    if len(canon):
        lf_cum = np.concatenate([[0], np.cumsum(canon == _LF)])
        n_lf = (lf_cum[c_off[1:]] - lf_cum[c_off[:-1]]).astype(np.int64)
    else:
        n_lf = np.zeros(ndocs, dtype=np.int64)
    n_lines = np.where(c_counts > 0, n_lf + 1, 0).astype(np.int64)
    status = np.where(c_counts > 0, "ok", "empty")
    out = {"sha256": sha_raw, "sha256_canon": sha_canon,
           "n_bytes": n_bytes, "n_lines": n_lines, "status": status}
    if return_canonical:
        out["content_canon"] = pa.Array.from_buffers(
            pa.large_string(), ndocs,
            [None, pa.py_buffer(np.ascontiguousarray(c_off).tobytes()),
             pa.py_buffer(np.ascontiguousarray(canon).tobytes())])
    return out
