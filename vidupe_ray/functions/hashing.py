"""Vectorized fingerprint kernels (numpy, deterministic, seed-driven).

The Ray-Data recast of the reference's fingerprint math:

- ``simhash_from_shingles``  ≈ ``computePhash`` (``video.cpp:197-228``): the
  reference DCT-pHashes a 32x32 gray frame into a 64-bit sign bitmap (bit =
  coefficient above mean); we SimHash the shingle stream into a 64-bit sign
  bitmap (bit = column sum above half).  Same shape: cheap 64-bit sketch,
  compared by Hamming distance.
- ``minhash_from_shingles``  ≈ the 16x16 SSIM gray mat (``video.cpp:187-189``):
  the expensive, higher-fidelity second-stage representation.
- ``head_tail_ranges``       ≈ CutEnds sampling at 8%/96% of duration
  (``thumbnail.h:26``): one sketch for the head window, one for the tail.
- ``bottom_k_distinct``      — anchor sketch for the containment/substring
  pass (north-rule addition; no reference analogue).

All functions operate on *concatenated* per-batch arrays with doc offsets, so
one numpy call covers every document in an Arrow batch — no per-row Python in
the hot loop.  All arithmetic is uint64 wraparound; constants are np.uint64 to
avoid numpy's int->float64 promotion trap.
"""

from __future__ import annotations

import numpy as np
from pandas.util import hash_array

U64 = np.uint64
_UINT64_MAX = U64(0xFFFF_FFFF_FFFF_FFFF)

# splitmix64 finalizer constants
_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)
_GOLDEN = U64(0x9E3779B97F4A7C15)

# 8-bit popcount lookup table
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain bit mixer (Steele et al.)."""
    x = x.astype(U64, copy=True)
    x ^= x >> U64(30)
    x *= _MIX1
    x ^= x >> U64(27)
    x *= _MIX2
    x ^= x >> U64(31)
    return x


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (LUT; numpy<2 lacks bitwise_count).

    Semantics analogue of the reference's Kernighan loop
    (``comparison.cpp:162-166``).
    """
    x = np.ascontiguousarray(x, dtype=U64)
    return _POP8[x.view(np.uint8)].reshape(-1, 8).sum(axis=1).astype(np.int64)


def hash_token_lists(token_lists: list) -> tuple:
    """Hash every token of every doc in one vectorized call.

    Returns ``(token_hashes: uint64[N], offsets: int64[D+1])`` where doc ``d``
    owns ``token_hashes[offsets[d]:offsets[d+1]]``.  Uses pandas'
    SipHash-based ``hash_array`` (C-vectorized, deterministic across
    processes with the default fixed key).
    """
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    if offsets[-1] == 0:
        return np.empty(0, dtype=U64), offsets
    flat = np.empty(offsets[-1], dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos:pos + len(toks)] = toks
        pos += len(toks)
    return hash_array(flat, categorize=False).astype(U64), offsets


# --- byte-level tokenizer+hasher (no Python strings in the hot path) -----
# word bytes: [0-9A-Za-z_] plus every byte >= 0x80 (UTF-8 lead/continuation
# bytes), so ASCII tokenization matches the \w+ regex exactly and non-ASCII
# runs form single tokens (same as \w+ for contiguous CJK/accented text;
# differs only for non-ASCII punctuation adjacent to words — an accepted,
# internally-consistent semantic, shared with the oracle).
_WORD_LUT = np.zeros(256, dtype=bool)
for _c in range(256):
    _WORD_LUT[_c] = (
        0x30 <= _c <= 0x39 or 0x41 <= _c <= 0x5A or 0x61 <= _c <= 0x7A
        or _c == 0x5F or _c >= 0x80)

# whitespace-split semantics (token = maximal run of non-[ \t\f\v\r\n]
# bytes) — matches str.split() / the oracle's regexp_split_to_array class;
# used by the exact n-gram join, which defines tokens by whitespace, not \w
_NONWS_LUT = np.ones(256, dtype=bool)
for _c in b" \t\f\v\r\n":
    _NONWS_LUT[_c] = False

_POLY_P = U64(0x9E3779B97F4A7C15 | 1)   # odd => invertible mod 2^64


def _mod_inverse_u64(a: np.uint64) -> np.uint64:
    """Inverse of an odd a mod 2^64 (Newton iteration)."""
    x = int(a)
    m = (1 << 64) - 1
    for _ in range(6):
        x = (x * (2 - int(a) * x)) & m
    return U64(x)


_POLY_PINV = _mod_inverse_u64(_POLY_P)


_POW_TABLES: dict = {}
_TOKENIZE_CHUNK = 1 << 16          # 64 KiB of text per chunk: every u64
                                   # temporary (power tables, prefix sums)
                                   # stays L2-resident.  The unchunked
                                   # version allocated 24 BYTES of u64
                                   # temporaries per input byte (~1.5 GB
                                   # DRAM traffic per 24 MB batch) and was
                                   # the fingerprint stage's bandwidth
                                   # ceiling (BASELINE.md roofline table).


def _pow_tables(n: int) -> tuple:
    """(P^i, Pinv^i) tables, data-independent — computed once per process
    and reused by every chunk/batch."""
    t = _POW_TABLES.get("t")
    if t is None or len(t[0]) < n:
        size = max(n, _TOKENIZE_CHUNK)
        base = np.full(size, _POLY_P, dtype=U64)
        base[0] = U64(1)
        ppow = np.multiply.accumulate(base)
        base[:] = _POLY_PINV
        base[0] = U64(1)
        pinv = np.multiply.accumulate(base)
        t = (ppow, pinv)
        _POW_TABLES["t"] = t
    return t


def byte_tokenize_hash(arr, seed: int, lut: np.ndarray | None = None) -> tuple:
    """Tokenize+hash an Arrow string array fully vectorized at byte level.

    Returns ``(token_hashes: uint64[N], tok_offsets: int64[D+1])`` —
    drop-in for ``hash_token_lists(tokenize(...))`` without creating a
    single Python string.  Token hash = mixed polynomial of the token's
    bytes (prefix-sum trick: H(s,e) = (S[e]-S[s]) * P^(e-1) in Z/2^64,
    where S is the cumulative sum of byte[j]*Pinv^j).  Because
    P^(e-1)*(Pinv^j) = P^(e-1-j) the hash depends only on the token's own
    bytes, so the buffer is processed in doc-aligned ~64 KiB chunks with
    chunk-local indices — bit-identical results, cache-resident
    temporaries (the power tables are data-independent process-cached
    constants).

    Tokens never cross document boundaries (explicit mask breaks at the
    string offsets).  Nulls count as empty documents.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    ndocs = len(arr)
    off_dtype = (np.int64 if pa.types.is_large_string(arr.type)
                 else np.int32)
    off_buf = arr.buffers()[1]
    offs_full = np.frombuffer(off_buf, dtype=off_dtype)
    offs = offs_full[arr.offset:arr.offset + ndocs + 1].astype(np.int64)
    buf = arr.buffers()[2]
    if buf is None or offs[-1] == offs[0]:
        return (np.empty(0, dtype=U64),
                np.zeros(ndocs + 1, dtype=np.int64))
    data = np.frombuffer(buf, dtype=np.uint8)
    lo = offs[0]
    b = data[lo:offs[-1]]
    doc_off = offs - lo
    n = len(b)

    # doc-aligned chunk boundaries: greedy fill to ~_TOKENIZE_CHUNK bytes
    # (a doc larger than the chunk target gets its own chunk)
    counts_all = np.zeros(ndocs, dtype=np.int64)
    h_parts = []
    d0 = 0
    while d0 < ndocs:
        d1 = int(np.searchsorted(doc_off,
                                 doc_off[d0] + _TOKENIZE_CHUNK,
                                 side="left"))
        d1 = max(d1, d0 + 1)
        d1 = min(d1, ndocs)
        h, cnts = _tokenize_span(b, doc_off, d0, d1, seed, lut)
        if len(h):
            h_parts.append(h)
        counts_all[d0:d1] = cnts
        d0 = d1
    hashes = (np.concatenate(h_parts) if h_parts
              else np.empty(0, dtype=U64))
    tok_offsets = np.concatenate(
        [[0], np.cumsum(counts_all)]).astype(np.int64)
    return hashes, tok_offsets


def _tokenize_span(b: np.ndarray, doc_off: np.ndarray, d0: int, d1: int,
                   seed: int, lut: np.ndarray | None = None) -> tuple:
    """Token hashes + per-doc counts for docs [d0, d1) — all temporaries
    sized to the span.  ``lut`` selects the token byte class (default the
    \\w-run LUT; ``_NONWS_LUT`` gives whitespace-split semantics)."""
    lo, hi = int(doc_off[d0]), int(doc_off[d1])
    n = hi - lo
    if n == 0:
        return np.empty(0, dtype=U64), np.zeros(d1 - d0, dtype=np.int64)
    bb = b[lo:hi]
    span_off = doc_off[d0:d1 + 1] - lo

    m = (_WORD_LUT if lut is None else lut)[bb]
    prev = np.empty_like(m)
    prev[0] = False
    prev[1:] = m[:-1]
    nxt = np.empty_like(m)
    nxt[-1] = False
    nxt[:-1] = m[1:]
    inner = span_off[1:-1]
    inner = inner[(inner > 0) & (inner < n)]
    prev[inner] = False          # a doc start never continues a token
    nxt[inner - 1] = False       # a doc end always terminates one
    starts = np.flatnonzero(m & ~prev)
    ends = np.flatnonzero(m & ~nxt) + 1

    ppow, pinv = _pow_tables(n)
    s = np.empty(n + 1, dtype=U64)
    s[0] = U64(0)
    np.cumsum(bb.astype(U64) * pinv[:n], out=s[1:])
    h = (s[ends] - s[starts]) * ppow[ends - 1]
    # fold in token length (cheap collision guard) and the seed, then mix
    h = mix64(h ^ ((ends - starts).astype(U64) * _GOLDEN) ^ U64(seed))

    tok_doc = np.searchsorted(span_off[1:], starts, side="right")
    counts = np.bincount(tok_doc, minlength=d1 - d0)
    return h, counts


def _window_coeffs(k: int, seed: int) -> np.ndarray:
    """k odd multipliers for the polynomial shingle combine."""
    rng = np.random.RandomState(seed ^ 0x5EED)
    c = rng.randint(1, 2**62, size=k).astype(U64)
    return c | U64(1)   # odd => bijective multiplier mod 2^64


def shingles_from_tokens(token_hashes: np.ndarray, offsets: np.ndarray,
                         k: int, seed: int) -> tuple:
    """k-token shingle hashes for every doc, batch-vectorized.

    Shingle ``j`` of a doc = sum_i C_i * token_hash[j+i] (uint64 wrap), then
    splitmix64-mixed.  The shingle stream is the analogue of the sampled
    frame stream (``video.cpp:122-174``): the deterministic positions the
    fingerprints are computed from.

    Returns ``(shingle_hashes: uint64[M], sh_offsets: int64[D+1])``.
    """
    ndocs = len(offsets) - 1
    n_tokens = np.diff(offsets)
    n_sh = np.maximum(n_tokens - k + 1, 0)
    sh_offsets = np.concatenate([[0], np.cumsum(n_sh)])
    total = int(sh_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), sh_offsets

    N = len(token_hashes)
    coeffs = _window_coeffs(k, seed)
    # global sliding-window polynomial over the concatenated token array
    acc = np.zeros(N - k + 1, dtype=U64)
    for i in range(k):
        acc += coeffs[i] * token_hashes[i:N - k + 1 + i]
    # select only windows fully inside one doc — ragged-arange gather
    # (one fancy-index instead of a per-doc Python copy loop)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        sh_offsets[:-1], n_sh)
    idx = np.repeat(offsets[:-1], n_sh) + within
    return mix64(acc[idx]), sh_offsets


def make_perm_params(num_perms: int, seed: int) -> tuple:
    """The 128 (a, b) MinHash multiply-shift params, built once per actor.

    'Model weights loaded once' pattern — the analogue of the static
    Prefs/DCT state shared across Video tasks (``video.cpp:4-11``,
    SURVEY.md §2.4 T3).
    """
    rng = np.random.RandomState(seed)
    a = (rng.randint(1, 2**62, size=num_perms).astype(U64) | U64(1))
    b = rng.randint(0, 2**62, size=num_perms).astype(U64)
    return a, b


_MINHASH_BUF: dict = {}
_SIMHASH_BUF: dict = {}


def minhash_from_shingles(sh: np.ndarray, sh_offsets: np.ndarray,
                          a: np.ndarray, b: np.ndarray,
                          perm_chunk: int = 16) -> np.ndarray:
    """(D, P) uint64 MinHash signatures via chunked minimum.reduceat.

    Empty docs get all-UINT64_MAX signatures (never collide in LSH).
    The (M, chunk) hash workspace is reused across calls (per process) —
    repeated multi-MB allocations across 32 concurrent workers turn into
    kernel page-zeroing contention otherwise.
    """
    ndocs = len(sh_offsets) - 1
    P = len(a)
    sig = np.full((ndocs, P), _UINT64_MAX, dtype=U64)
    starts = sh_offsets[:-1]
    nonempty = np.flatnonzero(sh_offsets[1:] > starts)
    if len(nonempty) == 0:
        return sig
    starts_ne = starts[nonempty].astype(np.int64)
    M = len(sh)
    buf = _MINHASH_BUF.get(perm_chunk)
    if buf is None or buf.shape[0] < M:
        buf = np.empty((max(M, 1 << 16), perm_chunk), dtype=U64)
        _MINHASH_BUF[perm_chunk] = buf
    for p0 in range(0, P, perm_chunk):
        p1 = min(p0 + perm_chunk, P)
        w = p1 - p0
        v = buf[:M, :w]
        np.multiply(sh[:, None], a[None, p0:p1], out=v)
        v += b[None, p0:p1]
        mins = np.minimum.reduceat(v, starts_ne, axis=0)
        sig[nonempty, p0:p1] = mins
    return sig


def minhash_signatures_cfg(sh: np.ndarray, sh_offsets: np.ndarray,
                           cfg) -> np.ndarray:
    """Scheme switch shared by the fingerprint stage AND the brute-force
    oracle, so the two can never drift (cfg.minhash_scheme)."""
    if cfg.minhash_scheme == "oph":
        return oph_minhash(sh, sh_offsets, cfg.num_perms, cfg.seed)
    a, b = make_perm_params(cfg.num_perms, cfg.seed)
    return minhash_from_shingles(sh, sh_offsets, a, b)


_OPH_BIN_SALT = U64(0xB1A5_0B1A_5EED_0001)


def oph_minhash(sh: np.ndarray, sh_offsets: np.ndarray, num_bins: int,
                seed: int) -> np.ndarray:
    """One-permutation MinHash with optimal densification.

    Classic k-perm MinHash touches every shingle ``k`` times (k=128 passes
    of multiply+reduce — ~200 MB of memory traffic per 512-doc batch, which
    saturates DRAM long before 32 cores are busy).  OPH (Li et al. 2012)
    makes ONE pass: each shingle hash is assigned to one of ``num_bins``
    bins by its (salted) top bits; the signature component for a bin is the
    minimum shingle hash landing in it.  Empty bins are filled by optimal
    densification (Shrivastava 2017): borrow the value of a
    uniformly-hash-chosen non-empty bin, so the equal-component fraction
    remains a consistent Jaccard estimator and empty-empty bins never
    spuriously match across docs.

    Returns (D, num_bins) uint64; all-empty docs stay all-UINT64_MAX
    (never collide in LSH).  Deterministic: no RNG, only hashes of
    (doc-local bin index, salt).
    """
    ndocs = len(sh_offsets) - 1
    sig = np.full((ndocs, num_bins), _UINT64_MAX, dtype=U64)
    M = len(sh)
    if M == 0:
        return sig
    bin_bits = int(np.log2(num_bins))
    if (1 << bin_bits) != num_bins:
        raise ValueError("num_bins must be a power of two")
    bins = (mix64(sh ^ (_OPH_BIN_SALT + U64(seed)))
            >> U64(64 - bin_bits)).astype(np.int64)
    counts = np.diff(sh_offsets)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    key = doc_idx * num_bins + bins
    order = np.argsort(key, kind="stable")
    ks = key[order]
    vs = sh[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(ks[1:] != ks[:-1]) + 1]).astype(np.int64)
    mins = np.minimum.reduceat(vs, starts)
    sig.reshape(-1)[ks[starts]] = mins

    # --- optimal densification (vectorized over the whole batch) ---------
    empty = sig == _UINT64_MAX                      # (D, B)
    n_non = num_bins - empty.sum(axis=1)            # non-empty bins per doc
    docs_e, bins_e = np.nonzero(empty)
    live = n_non[docs_e] > 0
    docs_e, bins_e = docs_e[live], bins_e[live]
    if len(docs_e):
        _, bins_n = np.nonzero(~empty)              # row-major: doc-grouped
        off = np.concatenate([[0], np.cumsum(n_non)]).astype(np.int64)
        # the borrow source is a function of (empty-bin index, seed) and the
        # doc's own occupancy ONLY — never of the batch-local doc index —
        # so a doc's signature is identical whatever batch it lands in and
        # identical shingle sets yield identical signatures
        r = (mix64(bins_e.astype(U64) * _GOLDEN + U64(seed))
             % n_non[docs_e].astype(U64)).astype(np.int64)
        src = bins_n[off[docs_e] + r]
        sig[docs_e, bins_e] = sig[docs_e, src]
    return sig


def simhash_multi(sh: np.ndarray, segment_sets: list) -> list:
    """64-bit SimHash of several sets of [start, end) segments over ONE
    shingle array, sharing a single unpackbits + cumulative-count pass
    (the expensive part; head/tail/full slots all reuse it).

    bit j of segment = 1 iff >= half of the segment's shingle hashes have
    bit j set — the sign-bitmap construction, the direct analogue of
    pHash's above-mean bitmap (``video.cpp:216-227``).  Empty segments -> 0
    (the monochrome-reject sentinel, ``video.cpp:210-211``).
    """
    if len(sh) == 0:
        return [np.zeros(len(s), dtype=U64) for s, _ in segment_sets]
    M = len(sh)
    cum_buf = _SIMHASH_BUF.get("cum")
    if cum_buf is None or cum_buf.shape[0] < M + 1:
        cum_buf = np.empty((max(M + 1, 1 << 16), 64), dtype=np.int32)
        _SIMHASH_BUF["cum"] = cum_buf
    bits = np.unpackbits(
        np.ascontiguousarray(sh, dtype=U64).view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little")                       # (M, 64) uint8
    cum = cum_buf[:M + 1]
    cum[0] = 0
    np.cumsum(bits, axis=0, dtype=np.int32, out=cum[1:])
    outs = []
    for seg_starts, seg_ends in segment_sets:
        counts = cum[seg_ends] - cum[seg_starts]         # (nseg, 64)
        n = (seg_ends - seg_starts).astype(np.int32)[:, None]
        valid = n[:, 0] > 0
        bitmap = (2 * counts >= n) & (n > 0)
        packed = np.packbits(bitmap.astype(np.uint8), axis=1,
                             bitorder="little")
        out = packed.view(U64)[:, 0].copy()
        out[~valid] = U64(0)
        outs.append(out)
    return outs


def simhash_segments(sh: np.ndarray, seg_starts: np.ndarray,
                     seg_ends: np.ndarray) -> np.ndarray:
    """Single-segment-set convenience wrapper over ``simhash_multi``."""
    return simhash_multi(sh, [(seg_starts, seg_ends)])[0]


def simhash_doc_slots(sh: np.ndarray, sh_offsets: np.ndarray,
                      window: int) -> tuple:
    """(full, head, tail) SimHash slots per doc — cache-resident variant.

    ``simhash_multi`` builds an (M, 64) int32 prefix-count matrix: ~70 MB
    of DRAM writes per 512-doc batch, which anti-scaled 32-way workers on a
    shared memory controller (measured: the simhash stage alone went 24s at
    8 CPUs -> 40s at 32).  Here each doc's (m, 64) bit matrix (~34 KB)
    lives entirely in L2: one unpackbits + three small column sums per
    doc, DRAM traffic = the shingle array read once.  Bit-identical to the
    segment implementation (shared sign rule), tested against it.
    """
    ndocs = len(sh_offsets) - 1
    full = np.zeros(ndocs, dtype=U64)
    head = np.zeros(ndocs, dtype=U64)
    tail = np.zeros(ndocs, dtype=U64)
    sh = np.ascontiguousarray(sh, dtype=U64)
    bytes_view = sh.view(np.uint8).reshape(-1, 8)

    def _pack(counts: np.ndarray, n: int) -> np.uint64:
        bitmap = (2 * counts >= n).astype(np.uint8)
        return np.packbits(bitmap, bitorder="little").view(U64)[0]

    for d in range(ndocs):
        s, e = int(sh_offsets[d]), int(sh_offsets[d + 1])
        m = e - s
        if m == 0:
            continue
        bits = np.unpackbits(bytes_view[s:e], axis=1, bitorder="little")
        c_full = bits.sum(axis=0, dtype=np.int64)
        full[d] = _pack(c_full, m)
        if m <= window:
            head[d] = full[d]
            tail[d] = full[d]
        else:
            head[d] = _pack(bits[:window].sum(axis=0, dtype=np.int64),
                            window)
            tail[d] = _pack(bits[m - window:].sum(axis=0, dtype=np.int64),
                            window)
    return full, head, tail


def head_tail_ranges(sh_offsets: np.ndarray, window: int) -> tuple:
    """Per-doc [start,end) of the head window and the tail window.

    CutEnds analogue (``thumbnail.h:26``): head = first ``window`` shingles,
    tail = last ``window`` shingles (the whole doc when shorter).
    """
    starts = sh_offsets[:-1].astype(np.int64)
    ends = sh_offsets[1:].astype(np.int64)
    n = ends - starts
    w = np.minimum(n, window)
    head = (starts, starts + w)
    tail = (ends - w, ends)
    return head, tail


def bottom_k_distinct(sh: np.ndarray, sh_offsets: np.ndarray,
                      k: int) -> tuple:
    """Per-doc k smallest distinct shingle hashes (containment anchors).

    If doc A's shingle set is a subset of doc B's, A's minima are elements
    of B's set, so sharing a bottom-k anchor is very likely (p ~ 1-e^(-k/r)
    for size ratio r) — the candidate channel for the substring pass.

    Returns ``(values: uint64[T], offsets: int64[D+1])`` — list-array form,
    ready for zero-copy Arrow assembly.
    """
    ndocs = len(sh_offsets) - 1
    n = len(sh)
    if n == 0 or ndocs == 0:
        return (np.empty(0, dtype=U64),
                np.zeros(ndocs + 1, dtype=np.int64))
    # per-doc sort+unique of ~200-element slices: measured 19x faster than
    # a batch-wide (value, doc) lexsort on this box — 16-byte lexsort keys
    # over the whole batch are DRAM-hostile, while each doc slice sorts in
    # cache (same pattern as simhash_doc_slots; outputs identical)
    vals = []
    counts = np.zeros(ndocs, dtype=np.int64)
    for d in range(ndocs):
        seg = sh[sh_offsets[d]:sh_offsets[d + 1]]
        if len(seg) == 0:
            continue
        u = np.unique(seg)[:k]       # sorted ascending, exact distinct
        counts[d] = len(u)
        vals.append(u)
    values = (np.concatenate(vals) if vals else np.empty(0, dtype=U64))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return values, offsets


def band_hashes(signatures: np.ndarray, bands: int, rows: int,
                seed: int) -> np.ndarray:
    """(D, bands) uint64 LSH band keys from (D, bands*rows) signatures.

    Band key = mixed polynomial of the band's ``rows`` signature values,
    xored with a per-band constant so identical row-slices in different
    bands never collide.
    """
    D = signatures.shape[0]
    sig3 = signatures.reshape(D, bands, rows)
    coeffs = _window_coeffs(rows, seed ^ 0xBA4D)
    acc = np.zeros((D, bands), dtype=U64)
    for r in range(rows):
        acc += coeffs[r] * sig3[:, :, r]
    band_salt = mix64(np.arange(bands, dtype=U64) * _GOLDEN + _GOLDEN)
    return mix64(acc ^ band_salt[None, :])
