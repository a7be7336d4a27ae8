"""LSH candidate generation + in-group verification — the shuffle that
replaces the reference's O(n^2) all-pairs sweep (``comparison.cpp:34-42``,
``101-126``) with O(n * bands) band rows (SURVEY.md §2.5 J1).

Two candidate channels share one bucketed shuffle:

- channel 0 (BAND): the 128-perm MinHash is banded ``bands x rows_per_band``;
  docs sharing a band slice are verified pairwise with the exact
  ``bothVideosMatch`` semantics (``functions/similarity.py``).
- channel 1 (ANCHOR): each doc's bottom-k distinct shingle hashes are keys;
  docs sharing an anchor with a >= ``min_containment_ratio`` size gap become
  containment *candidates* for the substring pass (north rule).  The
  MinHash containment estimate is only a priority, never a hard gate — it
  underestimates badly at large size skew (measured in round-1 verify).

Scale design: keys are shuffled as ``hash(key) % num_buckets`` and each
bucket (thousands of key-groups) is verified by ONE vectorized call —
per-key ``map_groups`` would pay per-group Python overhead at 10^12-file
key cardinality (see ``state/bucketing.py``).  Hot groups larger than
``band_group_cap`` switch from all-pairs to sorted ring-linking with a
window keeping ~cap^2 comparisons: cluster connectivity survives the cap
(transitive closure re-links), and capped groups are counted in the
emitted ``group_size`` column — never silent.

Emitted columns: a, b (a < b), jaccard, hamming, best_sim, kind
('near' verified | 'contain_cand' unverified), group_size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import hashing as H
from ..functions import similarity as S
from ..state import bucketing as B

_ANCHOR_CHANNEL_SALT = H.U64(0xA17C_0FFE_E125_9EA1)

PAIR_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()),
    ("jaccard", pa.float64()), ("hamming", pa.int32()),
    ("best_sim", pa.int32()), ("kind", pa.string()),
    ("group_size", pa.int32()),
])


def _empty_pairs() -> pa.Table:
    return PAIR_SCHEMA.empty_table()


def _as_array(col) -> pa.Array:
    """ChunkedArray -> Array (post-shuffle tables are often multi-chunk)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def fsl_matrix(table: pa.Table, name: str, width: int) -> np.ndarray:
    """fixed_size_list<uint64, width> column -> (n, width) uint64 matrix."""
    arr = _as_array(table.column(name))
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), width).astype(H.U64, copy=False)


class BandEmitter:
    """map_batches callable: signatures -> candidate key rows.

    ~``bands`` band rows + <= ``anchor_k`` anchor rows per doc, each
    carrying the verify payload so verification runs inside the shuffle
    group — no second join to fetch signatures.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return self._empty()
        low = batch.column("low_content").to_numpy(zero_copy_only=False)
        mh = fsl_matrix(batch, "minhash", cfg.num_perms)

        live = np.flatnonzero(~low)
        bh = H.band_hashes(mh[live], cfg.bands, cfg.rows_per_band, cfg.seed)
        band_idx = np.repeat(live, cfg.bands)
        band_keys = bh.reshape(-1)

        anchors = _as_array(batch.column("anchors"))
        a_offsets = anchors.offsets.to_numpy(zero_copy_only=False)
        a_values = anchors.values.to_numpy(zero_copy_only=False).astype(H.U64)
        a_counts = np.diff(a_offsets)
        anchor_idx = np.repeat(np.arange(n), a_counts)
        anchor_keys = H.mix64(a_values ^ _ANCHOR_CHANNEL_SALT)

        idx = np.concatenate([band_idx, anchor_idx])
        keys = np.concatenate([band_keys, anchor_keys]).view(np.int64)
        channel = np.concatenate([
            np.zeros(len(band_idx), dtype=np.uint8),
            np.ones(len(anchor_idx), dtype=np.uint8)])

        payload = batch.select(["doc_id", "n_tokens", "n_shingles",
                                "simhash_head", "simhash_tail", "minhash"])
        out = payload.take(pa.array(idx, pa.int64()))
        out = out.append_column("key", pa.array(keys, pa.int64()))
        out = out.append_column("channel", pa.array(channel, pa.uint8()))
        return out

    def _empty(self) -> pa.Table:
        cfg = self.cfg
        return pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_shingles", pa.int64()), ("simhash_head", pa.uint64()),
            ("simhash_tail", pa.uint64()),
            ("minhash", pa.list_(pa.uint64(), cfg.num_perms)),
            ("key", pa.int64()), ("channel", pa.uint8()),
        ]).empty_table()


class BucketVerifier:
    """One call per BUCKET (thousands of key-groups), fully vectorized:
    sort by (key, n_shingles, doc_id), find key segments, generate all
    within-segment pairs at once, evaluate both channels in two kernel
    calls."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, bucket: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = bucket.num_rows
        if n < 2:
            return _empty_pairs()
        key = bucket.column("key").to_numpy(zero_copy_only=False)
        doc_id = bucket.column("doc_id").to_numpy(zero_copy_only=False)
        nsh = bucket.column("n_shingles").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc_id, nsh, key))
        key = key[order]
        doc_id = doc_id[order]
        nsh = nsh[order]
        ntok = bucket.column("n_tokens").to_numpy(zero_copy_only=False)[order]
        chan = bucket.column("channel").to_numpy(zero_copy_only=False)[order]
        head = bucket.column("simhash_head").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]
        tail = bucket.column("simhash_tail").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]
        mh = fsl_matrix(bucket, "minhash", cfg.num_perms)[order]

        offsets = B.segment_boundaries(key)
        seg_chan = chan[offsets[:-1]]
        band_off = _filter_offsets(offsets, seg_chan == 0)
        anch_off = _filter_offsets(offsets, seg_chan == 1)

        tables = []
        # ---- band channel: full bothVideosMatch verification ------------
        i_idx, j_idx, _ = B.segment_pairs(band_off, cfg.band_group_cap)
        if len(i_idx):
            gsz = _pair_group_sizes(band_off, i_idx)
            jac = S.jaccard_from_minhash(mh[i_idx], mh[j_idx])
            r = S.evaluate_pairs(head[i_idx], head[j_idx],
                                 tail[i_idx], tail[j_idx],
                                 ntok[i_idx], ntok[j_idx], jac, cfg)
            keep = r["match"] & (doc_id[i_idx] != doc_id[j_idx])
            tables.append(_pairs_table(
                doc_id, i_idx[keep], j_idx[keep], jac[keep],
                r["hamming"][keep], r["best_sim"][keep], "near",
                gsz[keep]))
        # ---- anchor channel: containment candidates ---------------------
        i_idx, j_idx, _ = B.segment_pairs(anch_off, cfg.band_group_cap)
        if len(i_idx):
            gsz = _pair_group_sizes(anch_off, i_idx)
            # rows are size-sorted within segments: i = smaller side
            ratio_ok = nsh[j_idx] >= cfg.min_containment_ratio * nsh[i_idx]
            guard = nsh[i_idx] >= cfg.min_shingles
            keep = ratio_ok & guard & (doc_id[i_idx] != doc_id[j_idx])
            i_c, j_c = i_idx[keep], j_idx[keep]
            jac = S.jaccard_from_minhash(mh[i_c], mh[j_c])
            # soft estimate floor: cut anchor-collision noise before the
            # exact substring confirm (the estimate is a prioritizer, so
            # the floor sits far below the confirm threshold)
            est = S.containment_estimate(jac, nsh[i_c], nsh[j_c])
            sel = est >= cfg.containment_est_floor
            tables.append(_pairs_table(
                doc_id, i_c[sel], j_c[sel], jac[sel],
                np.full(int(sel.sum()), 64, dtype=np.int64),
                np.zeros(int(sel.sum()), dtype=np.int64), "contain_cand",
                gsz[keep][sel]))
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return _empty_pairs()
        return pa.concat_tables(tables)


def _filter_offsets(offsets: np.ndarray, seg_mask: np.ndarray) -> np.ndarray:
    """Segment offsets -> offsets list of the selected segments only,
    represented as a (2, k) start/end array flattened for segment_pairs."""
    starts = offsets[:-1][seg_mask]
    ends = offsets[1:][seg_mask]
    # segment_pairs expects boundary-style offsets; emulate with interleave
    return np.stack([starts, ends], axis=1)


def _pair_group_sizes(seg_off, i_idx):
    # map each pair back to its segment size via searchsorted on starts
    starts = seg_off[:, 0]
    sizes = (seg_off[:, 1] - seg_off[:, 0]).astype(np.int32)
    seg_of = np.searchsorted(starts, i_idx, side="right") - 1
    return sizes[seg_of]


def _pairs_table(doc_id, i_k, j_k, jac, hamming, best_sim, kind,
                 group_size) -> pa.Table:
    if len(i_k) == 0:
        return _empty_pairs()
    a = np.minimum(doc_id[i_k], doc_id[j_k])
    b = np.maximum(doc_id[i_k], doc_id[j_k])
    return pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
        "jaccard": pa.array(np.asarray(jac, dtype=np.float64), pa.float64()),
        "hamming": pa.array(np.asarray(hamming).astype(np.int32), pa.int32()),
        "best_sim": pa.array(np.asarray(best_sim).astype(np.int32),
                             pa.int32()),
        "kind": pa.array([kind] * len(i_k), pa.string()),
        "group_size": pa.array(np.asarray(group_size).astype(np.int32),
                               pa.int32()),
    })


def candidate_pairs(signatures_ds, cfg: PipelineConfig,
                    num_buckets: int = 64):
    """signatures -> deduped pair dataset (both channels).

    One flat emission, one bucketed shuffle + vectorized verify, one
    bucketed dedupe over tiny pair rows.
    """
    emitted = signatures_ds.map_batches(
        BandEmitter(cfg), batch_format="pyarrow", batch_size=cfg.batch_size)

    verifier = BucketVerifier(cfg)
    pairs = B.grouped_map(emitted, "key", B.bucket_of_ints,
                          lambda t: verifier(t),
                          num_buckets=num_buckets, batch_format="pyarrow")

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        # prefer verified 'near' rows over 'contain_cand' for the same pair
        pri = (df["kind"] != "near").astype(np.int8)
        df = df.assign(__pri=pri).sort_values(
            ["a", "b", "__pri"], kind="stable")
        df = df.drop_duplicates(["a", "b"], keep="first")
        return df.drop(columns="__pri")

    def _pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).view(H.U64)
        bb = batch.column("b").to_numpy(zero_copy_only=False).view(H.U64)
        pk = H.mix64(a * H.U64(0x9E3779B97F4A7C15) ^ bb).view(np.int64)
        return batch.append_column("pair_key", pa.array(pk, pa.int64()))

    keyed = pairs.map_batches(_pair_bucket, batch_format="pyarrow")
    deduped = B.grouped_map(
        keyed, "pair_key", B.bucket_of_ints,
        lambda df: _dedupe(df).drop(columns="pair_key"),
        num_buckets=num_buckets, batch_format="pandas")
    return deduped
