"""Pairwise match semantics — shared by the LSH verify stage AND the
brute-force oracle, so the two can never drift.

Mirrors ``Comparison::bothVideosMatch`` / ``phashSimilarity``
(``comparison.cpp:128-175``) exactly, recast from (pHash, SSIM, duration)
to (SimHash, MinHash-Jaccard, n_tokens):

- slot similarity: ``0`` when both slot hashes are zero
  (``comparison.cpp:157-158``), else ``64 - popcount(xor) + modifier``
  clamped to <= 64 (``comparison.cpp:160-174``).
- length modifier: lengths within tolerance => ``+same_len_bonus`` else
  ``-diff_len_penalty`` (``comparison.cpp:168-171``; durations-within-1s
  becomes relative-n_tokens-within-len_tolerance).
- two slots (head/tail), match takes the best (``comparison.cpp:133-136``).
- mode "simhash" (= _PHASH, the reference default ``prefs.h:14``): best
  slot similarity >= threshold_bits decides (``comparison.cpp:137-140``).
- mode "jaccard" (= _SSIM): gated at ``max(threshold_bits, 44)``
  (``comparison.cpp:142``), then ``jaccard + modifier/64 > threshold_frac``
  decides (``comparison.cpp:144-147``).

All functions are vectorized over parallel pair arrays.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from .hashing import U64, popcount64


def length_modifier(n_l: np.ndarray, n_r: np.ndarray,
                    cfg: PipelineConfig) -> np.ndarray:
    """+same_len_bonus when |n_l-n_r| <= len_tolerance * max, else
    -diff_len_penalty.  int64 array."""
    n_l = np.asarray(n_l, dtype=np.int64)
    n_r = np.asarray(n_r, dtype=np.int64)
    diff = np.abs(n_l - n_r)
    tol = cfg.len_tolerance * np.maximum(n_l, n_r)
    return np.where(diff <= tol,
                    np.int64(cfg.same_len_bonus),
                    np.int64(-cfg.diff_len_penalty))


def slot_similarity(h_l: np.ndarray, h_r: np.ndarray,
                    modifier: np.ndarray) -> np.ndarray:
    """Per-pair bits-of-64 similarity of one hash slot.

    Both-zero => 0 before any modifier (``comparison.cpp:157-158``);
    otherwise 64 - popcount(xor) + modifier, clamped to <= 64
    (``comparison.cpp:173-174``; note the reference clamps the top only).
    """
    h_l = np.asarray(h_l, dtype=U64)
    h_r = np.asarray(h_r, dtype=U64)
    dist = popcount64(h_l ^ h_r)
    sim = 64 - dist + np.asarray(modifier, dtype=np.int64)
    sim = np.minimum(sim, 64)
    both_zero = (h_l == U64(0)) & (h_r == U64(0))
    return np.where(both_zero, np.int64(0), sim)


def jaccard_from_minhash(sig_l: np.ndarray, sig_r: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of equal signature components.

    The richer second-stage similarity — the SSIM analogue
    (``ssim.cpp:11-64``), estimated from the (D, P) MinHash matrices.
    """
    return (np.asarray(sig_l) == np.asarray(sig_r)).mean(axis=1)


def containment_estimate(jaccard: np.ndarray, n_sh_l: np.ndarray,
                         n_sh_r: np.ndarray) -> np.ndarray:
    """Estimated |A ∩ B| / |smaller| from Jaccard and the two set sizes.

    |A∩B| = J * (|A|+|B|) / (1+J); containment of the smaller side follows.
    Used as the cheap gate before the exact substring confirm (north rule).
    """
    j = np.asarray(jaccard, dtype=np.float64)
    n_l = np.asarray(n_sh_l, dtype=np.float64)
    n_r = np.asarray(n_sh_r, dtype=np.float64)
    smaller = np.minimum(n_l, n_r)
    inter = j * (n_l + n_r) / (1.0 + j)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(smaller > 0, inter / smaller, 0.0)
    return np.minimum(c, 1.0)


def slot_gate(head_l, head_r, tail_l, tail_r, ntok_l, ntok_r,
              cfg: PipelineConfig) -> dict:
    """Phase-1 (cheap) half of bothVideosMatch: slot similarities + the
    Hamming gate, no Jaccard needed.

    Mirrors the reference cost pyramid exactly (``comparison.cpp:141-147``,
    F5 in SURVEY.md §2.3): the expensive second-stage similarity is only
    ever computed for pairs passing this gate.  In simhash mode the gate IS
    the final decision (``comparison.cpp:137-140``).

    Returns ``gate`` (bool), ``match_final`` (bool, simhash mode only),
    ``best_sim``, ``hamming``, ``modifier``.
    """
    mod = length_modifier(ntok_l, ntok_r, cfg)
    sim_head = slot_similarity(head_l, head_r, mod)
    sim_tail = slot_similarity(tail_l, tail_r, mod)
    best = np.maximum(sim_head, sim_tail)

    def _raw(h_l, h_r):
        h_l = np.asarray(h_l, dtype=U64)
        h_r = np.asarray(h_r, dtype=U64)
        d = popcount64(h_l ^ h_r)
        invalid = (h_l == U64(0)) & (h_r == U64(0))
        return np.where(invalid, np.int64(64), d)

    hamming = np.minimum(_raw(head_l, head_r), _raw(tail_l, tail_r))
    if cfg.mode == "simhash":
        gate = best >= cfg.threshold_bits
        match_final = gate
    else:
        gate = best >= max(cfg.threshold_bits, cfg.ssim_gate_floor)
        match_final = np.zeros(len(best), dtype=bool)
    return {"gate": gate, "match_final": match_final, "best_sim": best,
            "hamming": hamming, "modifier": mod}


def jaccard_decision(jaccard, modifier, cfg: PipelineConfig) -> np.ndarray:
    """Phase-2 half: ``jaccard + modifier/64 > threshold`` for gate-passing
    pairs (``comparison.cpp:144-147``)."""
    jac = np.asarray(jaccard, dtype=np.float64)
    mod = np.asarray(modifier, dtype=np.int64)
    return jac + mod / 64.0 > cfg.threshold_frac


def evaluate_pairs(head_l, head_r, tail_l, tail_r,
                   ntok_l, ntok_r, jaccard,
                   cfg: PipelineConfig) -> dict:
    """Full bothVideosMatch semantics over parallel pair arrays.

    Returns dict of arrays: ``match`` (bool), ``best_sim`` (int, modified,
    clamped), ``hamming`` (int, raw distance of the better valid slot; 64
    when neither slot is valid), ``modifier`` (int).
    """
    mod = length_modifier(ntok_l, ntok_r, cfg)
    sim_head = slot_similarity(head_l, head_r, mod)
    sim_tail = slot_similarity(tail_l, tail_r, mod)
    best = np.maximum(sim_head, sim_tail)

    # raw hamming of the better valid slot, for reporting/goldens
    def _raw(h_l, h_r):
        h_l = np.asarray(h_l, dtype=U64)
        h_r = np.asarray(h_r, dtype=U64)
        d = popcount64(h_l ^ h_r)
        invalid = (h_l == U64(0)) & (h_r == U64(0))
        return np.where(invalid, np.int64(64), d)

    hamming = np.minimum(_raw(head_l, head_r), _raw(tail_l, tail_r))

    jac = np.asarray(jaccard, dtype=np.float64)
    if cfg.mode == "simhash":
        match = best >= cfg.threshold_bits
    else:  # "jaccard" (SSIM analogue): hamming gate, jaccard decides
        gate = best >= max(cfg.threshold_bits, cfg.ssim_gate_floor)
        match = gate & (jac + mod / 64.0 > cfg.threshold_frac)
    return {"match": match, "best_sim": best, "hamming": hamming,
            "modifier": mod, "jaccard": jac}
