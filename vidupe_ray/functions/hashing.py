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
    # select only windows fully inside one doc
    out = np.empty(total, dtype=U64)
    for d in range(ndocs):
        m = n_sh[d]
        if m:
            s = offsets[d]
            out[sh_offsets[d]:sh_offsets[d + 1]] = acc[s:s + m]
    return mix64(out), sh_offsets


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


def minhash_from_shingles(sh: np.ndarray, sh_offsets: np.ndarray,
                          a: np.ndarray, b: np.ndarray,
                          perm_chunk: int = 16) -> np.ndarray:
    """(D, P) uint64 MinHash signatures via chunked minimum.reduceat.

    Empty docs get all-UINT64_MAX signatures (never collide in LSH).
    """
    ndocs = len(sh_offsets) - 1
    P = len(a)
    sig = np.full((ndocs, P), _UINT64_MAX, dtype=U64)
    starts = sh_offsets[:-1]
    nonempty = np.flatnonzero(sh_offsets[1:] > starts)
    if len(nonempty) == 0:
        return sig
    starts_ne = starts[nonempty].astype(np.int64)
    for p0 in range(0, P, perm_chunk):
        p1 = min(p0 + perm_chunk, P)
        # (M, chunk) hashed values; uint64 wraparound multiply-shift family
        v = sh[:, None] * a[None, p0:p1] + b[None, p0:p1]
        mins = np.minimum.reduceat(v, starts_ne, axis=0)
        sig[nonempty, p0:p1] = mins
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
    bits = np.unpackbits(
        np.ascontiguousarray(sh, dtype=U64).view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little")                       # (M, 64) uint8
    cum = np.zeros((len(sh) + 1, 64), dtype=np.int32)
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
    vals = []
    counts = np.zeros(ndocs, dtype=np.int64)
    for d in range(ndocs):
        seg = sh[sh_offsets[d]:sh_offsets[d + 1]]
        if len(seg) == 0:
            continue
        if len(seg) > 4 * k:
            # partial-select before the (small) unique
            seg = np.partition(seg, min(4 * k, len(seg) - 1))[:4 * k]
        u = np.unique(seg)[:k]       # sorted ascending
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
