"""LSH candidate generation + in-group verification — the shuffle that
replaces the reference's O(n^2) all-pairs sweep (``comparison.cpp:34-42``,
``101-126``) with O(n * bands) band rows (SURVEY.md §2.5 J1).

Two candidate channels share one ``groupby(key)`` shuffle:

- channel 0 (BAND): the 128-perm MinHash is banded ``bands x rows_per_band``;
  docs sharing a band slice land in one group and are verified pairwise with
  the exact ``bothVideosMatch`` semantics (``functions/similarity.py``).
- channel 1 (ANCHOR): each doc's bottom-k distinct shingle hashes are keys;
  docs sharing an anchor with a >= ``min_containment_ratio`` size gap become
  containment *candidates* for the substring pass (north rule).  The
  MinHash containment estimate is only a priority, never a hard gate —
  it underestimates badly at large size skew (measured in round-1 verify).

Skew handling (explicit, logged, never silent — SURVEY.md §7.3):

- band groups larger than ``band_group_cap`` switch from all-pairs to
  sorted ring-linking with a window sized to keep ~cap^2 comparisons;
  cluster connectivity survives (transitive closure re-links members),
  individual pair emission is capped and the drop is counted.
- anchor groups larger than the cap keep only the cap smallest docs as
  'contained' candidates against the cap largest as 'containers'.

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
    """Stateless-ish map_batches callable: signatures -> candidate key rows.

    ~``bands`` band rows + <= ``anchor_k`` anchor rows per doc, each
    carrying the verify payload so the verify runs inside the group —
    no second join to fetch signatures.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return self._empty(batch)
        low = batch.column("low_content").to_numpy(zero_copy_only=False)
        mh = fsl_matrix(batch, "minhash", cfg.num_perms)

        live = np.flatnonzero(~low)
        # --- band rows ---------------------------------------------------
        bh = H.band_hashes(mh[live], cfg.bands, cfg.rows_per_band, cfg.seed)
        band_idx = np.repeat(live, cfg.bands)
        band_keys = bh.reshape(-1)

        # --- anchor rows -------------------------------------------------
        anchors = _as_array(batch.column("anchors"))
        a_offsets = anchors.offsets.to_numpy(zero_copy_only=False)
        a_values = anchors.values.to_numpy(zero_copy_only=False).astype(H.U64)
        a_counts = np.diff(a_offsets)
        anchor_idx = np.repeat(np.arange(n), a_counts)
        anchor_keys = H.mix64(a_values ^ _ANCHOR_CHANNEL_SALT)

        idx = np.concatenate([band_idx, anchor_idx])
        keys = np.concatenate([band_keys, anchor_keys])
        channel = np.concatenate([
            np.zeros(len(band_idx), dtype=np.uint8),
            np.ones(len(anchor_idx), dtype=np.uint8)])

        payload = batch.select(["doc_id", "n_tokens", "n_shingles",
                                "simhash_head", "simhash_tail", "minhash"])
        out = payload.take(pa.array(idx, pa.int64()))
        out = out.append_column("key", pa.array(keys, pa.uint64()))
        out = out.append_column("channel", pa.array(channel, pa.uint8()))
        return out

    def _empty(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        return pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_shingles", pa.int64()), ("simhash_head", pa.uint64()),
            ("simhash_tail", pa.uint64()),
            ("minhash", pa.list_(pa.uint64(), cfg.num_perms)),
            ("key", pa.uint64()), ("channel", pa.uint8()),
        ]).empty_table()


class GroupVerifier:
    """map_groups callable: one LSH/anchor bucket -> verified/candidate pairs."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        g = group.num_rows
        if g < 2:
            return _empty_pairs()
        channel = group.column("channel")[0].as_py()

        doc_id = group.column("doc_id").to_numpy(zero_copy_only=False)
        # one doc can reach the same anchor/band key only once; but exact
        # signature twins are distinct docs and must stay
        order = np.argsort(doc_id, kind="stable")
        ntok = group.column("n_tokens").to_numpy(zero_copy_only=False)[order]
        nsh = group.column("n_shingles").to_numpy(zero_copy_only=False)[order]
        head = group.column("simhash_head").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]
        tail = group.column("simhash_tail").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]
        mh = fsl_matrix(group, "minhash", cfg.num_perms)[order]
        doc_id = doc_id[order]

        if channel == 0:
            i_idx, j_idx = self._band_pairs(g)
        else:
            i_idx, j_idx = self._anchor_pairs(nsh)
        if len(i_idx) == 0:
            return _empty_pairs()

        jac = S.jaccard_from_minhash(mh[i_idx], mh[j_idx])
        if channel == 0:
            r = S.evaluate_pairs(head[i_idx], head[j_idx],
                                 tail[i_idx], tail[j_idx],
                                 ntok[i_idx], ntok[j_idx], jac, cfg)
            keep = r["match"] & (doc_id[i_idx] != doc_id[j_idx])
            kind = "near"
            best_sim = r["best_sim"]
            hamming = r["hamming"]
        else:
            cont = S.containment_estimate(jac, nsh[i_idx], nsh[j_idx])
            keep = doc_id[i_idx] != doc_id[j_idx]
            # cap confirm load per group, highest estimated containment first
            max_pairs = cfg.band_group_cap * 4
            if keep.sum() > max_pairs:
                pri = np.where(keep, cont, -1.0)
                kth = np.partition(pri, len(pri) - max_pairs)[len(pri) - max_pairs]
                keep = keep & (pri >= kth)
            kind = "contain_cand"
            best_sim = np.zeros(len(i_idx), dtype=np.int64)
            hamming = np.full(len(i_idx), 64, dtype=np.int64)

        i_k, j_k = i_idx[keep], j_idx[keep]
        if len(i_k) == 0:
            return _empty_pairs()
        a = np.minimum(doc_id[i_k], doc_id[j_k])
        b = np.maximum(doc_id[i_k], doc_id[j_k])
        return pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
            "hamming": pa.array(hamming[keep].astype(np.int32), pa.int32()),
            "best_sim": pa.array(np.asarray(best_sim)[keep].astype(np.int32),
                                 pa.int32()),
            "kind": pa.array([kind] * len(i_k), pa.string()),
            "group_size": pa.array(np.full(len(i_k), g, np.int32), pa.int32()),
        })

    def _band_pairs(self, g: int) -> tuple:
        cap = self.cfg.band_group_cap
        if g <= cap:
            return np.triu_indices(g, k=1)
        # hot band: sorted ring linking, window keeps ~cap^2 comparisons
        w = max(1, (cap * cap) // g)
        i_list, j_list = [], []
        for off in range(1, w + 1):
            i_list.append(np.arange(0, g - off))
            j_list.append(np.arange(off, g))
        return np.concatenate(i_list), np.concatenate(j_list)

    def _anchor_pairs(self, nsh_sorted_by_doc: np.ndarray) -> tuple:
        cfg = self.cfg
        g = len(nsh_sorted_by_doc)
        cap = cfg.band_group_cap
        order = np.argsort(nsh_sorted_by_doc, kind="stable")
        small = order[:min(g, cap)]
        big = order[-min(g, cap):]
        ii, jj = np.meshgrid(small, big, indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        ratio_ok = (nsh_sorted_by_doc[jj]
                    >= cfg.min_containment_ratio * nsh_sorted_by_doc[ii])
        guard = (nsh_sorted_by_doc[ii] >= cfg.min_shingles)
        keep = ratio_ok & guard & (ii != jj)
        return ii[keep], jj[keep]


def candidate_pairs(signatures_ds, cfg: PipelineConfig):
    """signatures -> deduped pair dataset (both channels).

    One flat emission, one groupby shuffle, one dedupe groupby over tiny
    pair rows.
    """
    emitted = signatures_ds.map_batches(
        BandEmitter(cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
    verifier = GroupVerifier(cfg)

    def verify_group(t: pa.Table) -> pa.Table:   # map_groups needs a function
        return verifier(t)

    pairs = emitted.groupby("key").map_groups(
        verify_group, batch_format="pyarrow")

    def _dedupe(group: pd.DataFrame) -> pd.DataFrame:
        near = group[group["kind"] == "near"]
        if len(near):
            return near.iloc[[0]]
        return group.iloc[[0]]

    return pairs.groupby(["a", "b"]).map_groups(
        _dedupe, batch_format="pandas")
