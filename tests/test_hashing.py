"""Unit tests for the vectorized fingerprint kernels (SURVEY.md §5.1).

Each kernel is checked bit-exactly against a tiny pure-Python oracle.
"""

import numpy as np
import pytest

from vidupe_ray.config import PipelineConfig
from vidupe_ray.functions import hashing as H
from vidupe_ray.functions.text import canonicalize, tokenize

U64 = np.uint64


def test_popcount_matches_bin():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 0x8000000000000001,
                   12345678901234567], dtype=U64)
    got = H.popcount64(xs)
    want = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == want


def test_hash_token_lists_offsets_and_determinism():
    docs = [["a", "b", "c"], [], ["a", "b"], ["zzz"]]
    h1, off1 = H.hash_token_lists(docs)
    h2, off2 = H.hash_token_lists(docs)
    assert off1.tolist() == [0, 3, 3, 5, 6]
    np.testing.assert_array_equal(h1, h2)
    # same token -> same hash wherever it appears
    assert h1[0] == h1[3] and h1[1] == h1[4]
    assert h1.dtype == U64


def test_shingles_match_per_doc_oracle():
    k, seed = 3, 42
    docs = [["a", "b", "c", "d", "e"], ["x", "y"], ["p", "q", "r"]]
    th, off = H.hash_token_lists(docs)
    sh, sh_off = H.shingles_from_tokens(th, off, k, seed)
    # doc0 has 3 shingles, doc1 has 0 (too short), doc2 has 1
    assert sh_off.tolist() == [0, 3, 3, 4]
    # oracle: compute each doc independently — global window must not leak
    # across doc boundaries
    for d, toks in enumerate(docs):
        th_d, off_d = H.hash_token_lists([toks])
        sh_d, _ = H.shingles_from_tokens(th_d, off_d, k, seed)
        np.testing.assert_array_equal(sh[sh_off[d]:sh_off[d + 1]], sh_d)


def test_minhash_matches_bruteforce_min():
    rng = np.random.RandomState(0)
    sh = rng.randint(0, 2**63, size=50).astype(U64)
    offsets = np.array([0, 10, 10, 35, 50])  # doc1 empty
    a, b = H.make_perm_params(128, seed=42)
    sig = H.minhash_from_shingles(sh, offsets, a, b)
    assert sig.shape == (4, 128)
    for d, (s, e) in enumerate(zip(offsets[:-1], offsets[1:])):
        if s == e:
            assert (sig[d] == np.iinfo(np.uint64).max).all()
            continue
        for p in [0, 17, 127]:
            want = min((int(a[p]) * int(x) + int(b[p])) % 2**64
                       for x in sh[s:e])
            assert int(sig[d, p]) == want


def test_simhash_matches_bit_oracle():
    rng = np.random.RandomState(1)
    sh = rng.randint(0, 2**63, size=21).astype(U64)
    starts = np.array([0, 5, 5])
    ends = np.array([5, 5, 21])
    got = H.simhash_segments(sh, starts, ends)
    assert got[1] == 0  # empty segment -> monochrome-reject sentinel
    for seg_i, (s, e) in enumerate([(0, 5), (5, 21)]):
        want = 0
        n = e - s
        for bit in range(64):
            cnt = sum((int(x) >> bit) & 1 for x in sh[s:e])
            if 2 * cnt >= n:
                want |= 1 << bit
        assert int(got[0 if seg_i == 0 else 2]) == want


def test_head_tail_ranges():
    sh_off = np.array([0, 100, 103, 103])
    (hs, he), (ts, te) = H.head_tail_ranges(sh_off, window=10)
    assert (hs.tolist(), he.tolist()) == ([0, 100, 103], [10, 103, 103])
    assert (ts.tolist(), te.tolist()) == ([90, 100, 103], [100, 103, 103])


def test_bottom_k_distinct():
    sh = np.array([9, 3, 3, 7, 1, 100, 50], dtype=U64)
    vals, off = H.bottom_k_distinct(sh, np.array([0, 5, 5, 7]), k=3)
    assert off.tolist() == [0, 3, 3, 5]
    assert vals[off[0]:off[1]].tolist() == [1, 3, 7]
    assert vals[off[2]:off[3]].tolist() == [50, 100]


def test_band_hashes_shape_and_locality():
    rng = np.random.RandomState(2)
    sig = rng.randint(0, 2**63, size=(3, 128)).astype(U64)
    sig[1] = sig[0]                     # identical docs
    bh = H.band_hashes(sig, bands=16, rows=8, seed=42)
    assert bh.shape == (3, 16)
    np.testing.assert_array_equal(bh[0], bh[1])
    assert (bh[0] != bh[2]).any()
    # same row-slice in different bands must not collide (per-band salt)
    sig3 = np.tile(sig[0, :8], 16)[None, :]
    bh3 = H.band_hashes(sig3.astype(U64), 16, 8, 42)
    assert len(set(bh3[0].tolist())) == 16


def test_end_to_end_signature_determinism():
    cfg = PipelineConfig()
    text = "def foo(bar, baz):\n    return bar + baz\n" * 20
    toks = tokenize(canonicalize(text))
    th, off = H.hash_token_lists([toks])
    sh, sh_off = H.shingles_from_tokens(th, off, cfg.shingle_k, cfg.seed)
    a, b = H.make_perm_params(cfg.num_perms, cfg.seed)
    sig1 = H.minhash_from_shingles(sh, sh_off, a, b)
    sig2 = H.minhash_from_shingles(sh, sh_off, a, b)
    np.testing.assert_array_equal(sig1, sig2)
    assert sig1.shape == (1, 128)


def test_oph_minhash_properties():
    """One-permutation MinHash invariants: identical sets -> identical
    signatures, batch independence, per-bin minimum, determinism."""
    rng = np.random.RandomState(5)
    A = rng.randint(1, 2**63, size=40).astype(U64)
    B = rng.randint(1, 2**63, size=500).astype(U64)
    s1 = H.oph_minhash(np.concatenate([A, B]), np.array([0, 40, 540]),
                       128, 42)
    s2 = H.oph_minhash(A, np.array([0, 40]), 128, 42)
    np.testing.assert_array_equal(s1[0], s2[0])   # batch independence
    s3 = H.oph_minhash(np.concatenate([A, A]), np.array([0, 40, 80]),
                       128, 42)
    np.testing.assert_array_equal(s3[0], s3[1])   # identical sets
    # occupied bins hold the true per-bin minimum
    bins = (H.mix64(B ^ (H._OPH_BIN_SALT + U64(42))) >> U64(57)).astype(int)
    for b in range(0, 128, 17):
        members = B[bins == b]
        if len(members):
            assert s1[1, b] == members.min()
    # empty doc stays MAX
    s4 = H.oph_minhash(A, np.array([0, 0, 40]), 128, 42)
    assert (s4[0] == np.iinfo(np.uint64).max).all()


def test_oph_jaccard_estimator_quality():
    rng = np.random.RandomState(7)
    universe = rng.randint(1, 2**63, size=4000).astype(U64)
    for true_j in [1.0, 0.89, 0.7]:
        n = 1000
        inter = int(n * 2 * true_j / (1 + true_j))
        A = universe[:n]
        B = np.concatenate([universe[:inter], universe[n:2 * n - inter]])
        sig = H.oph_minhash(np.concatenate([A, B]),
                            np.array([0, n, n + len(B)]), 128, 42)
        est = (sig[0] == sig[1]).mean()
        assert abs(est - true_j) < 0.08, (true_j, est)


def test_simhash_doc_slots_matches_segment_impl():
    """The cache-resident per-doc variant must be bit-identical to the
    segment implementation."""
    rng = np.random.RandomState(9)
    counts = [0, 5, 300, 64, 65, 1]
    sh = rng.randint(0, 2**63, size=sum(counts)).astype(U64)
    off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    full, head, tail = H.simhash_doc_slots(sh, off, window=64)
    ref_full = H.simhash_segments(sh, off[:-1], off[1:])
    (hs, he), (ts, te) = H.head_tail_ranges(off, 64)
    ref_head = H.simhash_segments(sh, hs, he)
    ref_tail = H.simhash_segments(sh, ts, te)
    np.testing.assert_array_equal(full, ref_full)
    np.testing.assert_array_equal(head, ref_head)
    np.testing.assert_array_equal(tail, ref_tail)


def test_tokens_are_canonicalization_invariant():
    """The fingerprint stage tokenizes RAW text: \\w+ tokens must be
    identical on raw and canonical forms (whitespace-only transforms)."""
    from vidupe_ray.corpus import generate_corpus
    c, _ = generate_corpus(300, seed=2)
    for t in c["content"].to_pylist():
        assert tokenize(t) == tokenize(canonicalize(t))
    for t in ["a\r\nb", "  x\t\ty  ", "é ümlaut ß", "中文 变量", "a🎉b"]:
        assert tokenize(t) == tokenize(canonicalize(t))


def test_segment_pairs_cap_and_ring():
    from vidupe_ray.state.bucketing import segment_pairs, segment_boundaries
    # two segments: size 4 (full triu) and size 10 with cap 5 (ring window)
    seg = np.array([[0, 4], [4, 14]])
    i, j, capped = segment_pairs(seg, cap=5)
    assert capped.tolist() == [False, True]
    # segment 0: all 6 pairs
    in0 = (i < 4)
    assert in0.sum() == 6
    # segment 1: ring window w = cap*cap//g = 25//10 = 2
    in1 = ~in0
    assert in1.sum() == 9 + 8                       # offsets 1 and 2
    assert set((j[in1] - i[in1]).tolist()) == {1, 2}
    # all pairs within bounds and i < j
    assert (i < j).all() and (j < 14).all()
    # connectivity: ring pairs chain the whole oversized segment
    import itertools
    nodes = set(range(4, 14))
    edges = set(zip(i[in1], j[in1]))
    reach = {4}
    for _ in range(10):
        reach |= {b for a, b in edges if a in reach}
        reach |= {a for a, b in edges if b in reach}
    assert reach == nodes


def test_segment_boundaries_basic():
    from vidupe_ray.state.bucketing import segment_boundaries
    keys = np.array([1, 1, 2, 2, 2, 7])
    assert segment_boundaries(keys).tolist() == [0, 2, 5, 6]
    assert segment_boundaries(np.array([])).tolist() == [0]


def test_nonws_tokenizer_matches_str_split():
    """Whitespace-split byte tokenizer (the hashed n-gram join's token
    semantics): token counts match str.split() exactly, equal token
    strings hash equally across docs, and the default-LUT path is
    bit-identical to before the lut parameter existed."""
    import pyarrow as pa
    from vidupe_ray.functions import hashing as H

    texts = ["a b c d", "  lead trail  ", "", "one", "x\ty\nz w",
             "a  b\f\vc", None, "tab\there now", "\n\n\n",
             "a b c a b c a b c"]
    arr = pa.array(texts, pa.string())
    th, off = H.byte_tokenize_hash(arr, 0x7216A3, lut=H._NONWS_LUT)
    for i, t in enumerate(texts):
        assert off[i + 1] - off[i] == len((t or "").split())
    # equal tokens hash equally across documents
    h_abcd = th[off[0]:off[1]]
    h_rep = th[off[9]:off[10]]
    assert h_abcd[0] == h_rep[0] == h_rep[3]
    assert h_abcd[1] == h_rep[1]
    # trigram shingles of a repeated phrase collapse to 3 distinct values
    sh, soff = H.shingles_from_tokens(th, off, 3, 0x7216A3)
    vals, voff = H.bottom_k_distinct(sh, soff, 1 << 62)
    got = voff[10] - voff[9]
    want = len({" ".join(texts[9].split()[i:i + 3]) for i in range(7)})
    assert got == want
    # regression guard: default-LUT callers are unchanged
    a2, b2 = H.byte_tokenize_hash(arr, 42)
    a3, b3 = H.byte_tokenize_hash(arr, 42, lut=None)
    assert np.array_equal(a2, a3) and np.array_equal(b2, b3)


def test_segment_pairs_vectorized_matches_triu():
    """The vectorized g<=cap all-pairs path (VERDICT r3 #2) emits the
    bit-identical pair SET as per-segment np.triu_indices, for both skew
    strategies, over random segmentations."""
    from vidupe_ray.state.bucketing import segment_pairs
    rng = np.random.default_rng(7)
    for trial in range(50):
        k = int(rng.integers(1, 30))
        lens = rng.integers(0, 12, size=k)
        off = np.concatenate([[0], lens.cumsum()])
        seg = np.stack([off[:-1], off[1:]], axis=1)
        cap = int(rng.integers(2, 14))
        salt = rng.integers(0, 1 << 40, size=int(off[-1]))
        for strat in ("ring", "salt"):
            i, j, capped = segment_pairs(seg, cap, strategy=strat,
                                         salt_ids=salt)
            assert (i < j).all()
            assert capped.tolist() == (lens > cap).tolist()
            ref = set()
            for s in range(k):
                lo, hi = int(seg[s, 0]), int(seg[s, 1])
                g = hi - lo
                if 2 <= g <= cap:
                    ti, tj = np.triu_indices(g, k=1)
                    ref |= set(zip((ti + lo).tolist(), (tj + lo).tolist()))
            got_small = {
                (a, b) for a, b in zip(i.tolist(), j.tolist())
                if (lambda s: seg[s, 1] - seg[s, 0] <= cap)(
                    int(np.searchsorted(seg[:, 0], a, side="right")) - 1)}
            assert got_small == ref
