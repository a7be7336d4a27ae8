"""Property-based tests (hypothesis) for the kernel invariants the whole
engine rests on (SURVEY.md §5.3)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from vidupe_ray.functions import hashing as H
from vidupe_ray.functions.text import canonicalize, tokenize

U64 = np.uint64

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=150, deadline=None)
@given(text_st)
def test_canonicalize_idempotent(t):
    c = canonicalize(t)
    assert canonicalize(c) == c


@settings(max_examples=150, deadline=None)
@given(text_st)
def test_tokens_survive_canonicalization(t):
    assert tokenize(t) == tokenize(canonicalize(t))


@settings(max_examples=100, deadline=None)
@given(st.lists(text_st, max_size=8))
def test_byte_tokenizer_is_batch_independent(texts):
    arr = pa.array(texts, pa.string())
    h_all, off_all = H.byte_tokenize_hash(arr, 42)
    for i, t in enumerate(texts):
        h_one, off_one = H.byte_tokenize_hash(pa.array([t], pa.string()), 42)
        np.testing.assert_array_equal(
            h_all[off_all[i]:off_all[i + 1]], h_one[:off_one[1]])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(1, 2**63 - 1), min_size=0, max_size=300),
       st.integers(0, 2**31))
def test_oph_identical_sets_and_determinism(vals, seed):
    sh = np.array(vals, dtype=U64)
    off = np.array([0, len(sh), 2 * len(sh)])
    both = np.concatenate([sh, sh])
    s1 = H.oph_minhash(both, off, 128, seed)
    s2 = H.oph_minhash(both, off, 128, seed)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(s1[0], s1[1])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=200),
       st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=200))
def test_oph_subset_monotone_containment(a_vals, b_vals):
    """A ⊆ A∪B: on every bin A actually occupies, the union's minimum is
    <= A's minimum (densified/borrowed bins carry borrowed values and are
    excluded — they are estimator filler, not set minima)."""
    A = np.unique(np.array(a_vals, dtype=U64))
    U = np.unique(np.concatenate([A, np.array(b_vals, dtype=U64)]))
    sh = np.concatenate([A, U])
    off = np.array([0, len(A), len(A) + len(U)])
    sig = H.oph_minhash(sh, off, 128, 42)
    bins_a = (H.mix64(A ^ (H._OPH_BIN_SALT + U64(42)))
              >> U64(57)).astype(int)
    occupied = np.zeros(128, dtype=bool)
    occupied[np.unique(bins_a)] = True
    assert (sig[1][occupied] <= sig[0][occupied]).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=100))
def test_popcount_and_mix_stability(vals):
    x = np.array(vals, dtype=U64)
    assert (H.popcount64(x) == [bin(int(v)).count("1") for v in x]).all()
    np.testing.assert_array_equal(H.mix64(x), H.mix64(x.copy()))
