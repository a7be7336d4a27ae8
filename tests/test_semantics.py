"""Match-semantics unit tests mirroring comparison.cpp (SURVEY.md §5.1)."""

import numpy as np
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.functions import similarity as S
from vidupe_ray.functions.hashing import U64


def test_threshold_mapping():
    # round(64 * v/100) — reference mainwindow.cpp:113
    assert PipelineConfig(threshold_pct=89).threshold_bits == 57
    assert PipelineConfig(threshold_pct=100).threshold_bits == 64
    assert PipelineConfig(threshold_pct=50).threshold_bits == 32
    assert PipelineConfig(threshold_pct=89).threshold_frac == 0.89


def test_slot_similarity_both_zero_is_zero():
    # comparison.cpp:157-158: two zero hashes are NOT similar
    sim = S.slot_similarity(np.array([0], dtype=U64),
                            np.array([0], dtype=U64),
                            np.array([1]))
    assert sim.tolist() == [0]


def test_slot_similarity_clamped_at_64():
    # comparison.cpp:173-174: identical hashes + bonus clamps to 64
    h = np.array([0xDEADBEEF], dtype=U64)
    sim = S.slot_similarity(h, h, np.array([1]))
    assert sim.tolist() == [64]
    # penalty applies below the clamp
    sim = S.slot_similarity(h, h, np.array([-4]))
    assert sim.tolist() == [60]


def test_slot_similarity_counts_bits():
    l = np.array([0b1111, 0], dtype=U64)
    r = np.array([0b0000, 1], dtype=U64)
    sim = S.slot_similarity(l, r, np.array([0, 0]))
    assert sim.tolist() == [60, 63]   # 4 and 1 differing bits


def test_length_modifier_tolerance():
    cfg = PipelineConfig()
    m = S.length_modifier(np.array([100, 100, 0]),
                          np.array([101, 90, 0]), cfg)
    # 1/101 < 2% -> bonus; 10/100 > 2% -> penalty; 0 vs 0 -> bonus
    assert m.tolist() == [1, -4, 1]


def test_jaccard_from_minhash():
    a = np.arange(128, dtype=U64)[None, :]
    b = a.copy()
    b[0, :32] += U64(1)
    assert S.jaccard_from_minhash(a, b)[0] == pytest.approx(0.75)


def test_containment_estimate_subset():
    # A strict subset of B, |B| = 3|A|: J = 1/3 -> containment 1.0
    c = S.containment_estimate(np.array([1 / 3]), np.array([100]),
                               np.array([300]))
    assert c[0] == pytest.approx(1.0, abs=1e-9)
    # disjoint -> 0
    assert S.containment_estimate(np.array([0.0]), np.array([10]),
                                  np.array([10]))[0] == 0.0


def _pairs(cfg, head_l, head_r, tail_l, tail_r, n_l, n_r, jac):
    return S.evaluate_pairs(
        np.array([head_l], dtype=U64), np.array([head_r], dtype=U64),
        np.array([tail_l], dtype=U64), np.array([tail_r], dtype=U64),
        np.array([n_l]), np.array([n_r]), np.array([jac]), cfg)


def test_simhash_mode_threshold():
    cfg = PipelineConfig(mode="simhash")
    h = 0xABCDEF0123456789
    # identical head slot: sim = min(64+1, 64) = 64 >= 57 -> match
    r = _pairs(cfg, h, h, 1, 2, 100, 100, 0.0)
    assert bool(r["match"][0]) and r["best_sim"][0] == 64
    # flip 12 bits -> sim 52+1=53 < 57 -> no match
    h2 = h ^ ((1 << 12) - 1)
    r = _pairs(cfg, h, h2, 0, 0, 100, 100, 0.0)
    assert not bool(r["match"][0])


def test_jaccard_mode_gate_and_decision():
    cfg = PipelineConfig(mode="jaccard")
    h = 0xABCDEF0123456789
    # gate passes (identical slot), jaccard 0.95 + 1/64 > 0.89 -> match
    r = _pairs(cfg, h, h, 0, 0, 100, 100, 0.95)
    assert bool(r["match"][0])
    # gate passes but jaccard too low -> no match
    r = _pairs(cfg, h, h, 0, 0, 100, 100, 0.80)
    assert not bool(r["match"][0])
    # jaccard high but gate fails (hamming too far) -> no match
    h2 = h ^ ((1 << 25) - 1)
    r = _pairs(cfg, h, h2, 0, 0, 100, 100, 0.99)
    assert not bool(r["match"][0])
    # penalty flips a borderline jaccard: 0.90 + (-4)/64 = 0.8375 < 0.89
    r = _pairs(cfg, h, h, 0, 0, 100, 200, 0.90)
    assert not bool(r["match"][0])


def test_best_of_two_slots():
    # cutEnds semantics: second (tail) slot match suffices
    cfg = PipelineConfig(mode="simhash")
    t = 0x123456789ABCDEF0
    r = _pairs(cfg, 0xF0F0F0F0F0F0F0F0, 0x0F0F0F0F0F0F0F0F, t, t,
               100, 100, 0.0)
    assert bool(r["match"][0]) and r["best_sim"][0] == 64


def test_monotone_threshold_property():
    # raising the threshold never creates matches (SURVEY.md §5.3c)
    rng = np.random.RandomState(3)
    n = 500
    base = rng.randint(0, 2**63, size=n).astype(U64)
    noise = rng.randint(0, 2**16, size=n).astype(U64)
    head_l, head_r = base, base ^ noise
    jac = rng.rand(n)
    ntok = rng.randint(50, 500, size=n)
    prev = None
    for pct in [70, 80, 89, 95, 100]:
        cfg = PipelineConfig(threshold_pct=pct)
        m = S.evaluate_pairs(head_l, head_r, head_l, head_r,
                             ntok, ntok, jac, cfg)["match"]
        if prev is not None:
            assert not (m & ~prev).any()
        prev = m
