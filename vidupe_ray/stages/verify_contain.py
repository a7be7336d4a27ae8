"""Containment confirm — the substring pass (north rule; SURVEY.md §2.5 J5).

The CutEnds partial-overlap semantic (``thumbnail.h:26``,
``comparison.cpp:133-151``) generalized: a doc embedded verbatim inside a
larger doc is a duplicate even when whole-doc Jaccard is far below
threshold.  Candidates come from the anchor channel; here each candidate
pair is confirmed by an EXACT substring check on canonical text (the
suffix-array semantics; CPython's two-way string search plays the role of
the suffix automaton — O(n+m) worst case, no index build).

Content is re-joined for candidate docs only (wide-record management,
SURVEY.md §7.4), with two cap-gated plans:

- BROADCAST (candidate count <= ``broadcast_cap`` AND canonical bytes <=
  ``broadcast_bytes_cap``): the candidate (doc_id, content_canon) columns
  are collected as sorted Arrow arrays and ``ray.put`` once; each confirm
  batch probes by ``searchsorted`` — no Python dict, no per-pair hashing.
- GRID (above either cap): candidate content is id-filtered in place
  (sharded key refs), sharded once by builder tasks, and joined onto the
  pair rows by a k x k grid join where ONLY the slim pair rows shuffle
  (``state/joins.grid_pair_apply``); no single object ever holds all of
  the content.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import PipelineConfig


def collect_ids(pairs_ds, cols=("a", "b")) -> np.ndarray:
    ids = []
    for b in pairs_ds.select_columns(list(cols)).iter_batches(
            batch_size=1 << 20, batch_format="pandas"):
        for c in cols:
            ids.append(b[c].to_numpy(np.int64))
    if not ids:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(ids))


def _mark_contained(out: pa.Table) -> pa.Table:
    ki = out.schema.get_field_index("kind")
    return out.set_column(ki, "kind",
                          pa.array(["contain"] * out.num_rows, pa.string()))


def _substring_keep(texts_a, texts_b) -> np.ndarray:
    """Vectorized-as-possible pair loop: the exact check itself is
    CPython's C-level two-way search (``small in big``)."""
    n = len(texts_a)
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        ta, tb = texts_a[i], texts_b[i]
        if ta is None or tb is None:
            continue
        small, big = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        keep[i] = bool(small) and small in big
    return keep


def confirm_containment(cand_pairs_ds, winners_ds, cfg: PipelineConfig,
                        n_pairs: int | None = None):
    """contain_cand pairs + winner rows -> confirmed 'contain' pairs.

    ``winners_ds`` carries raw ``content`` (plus doc_id); candidate content
    is canonicalized on the fly (same canonical form the fingerprints
    used).
    """
    from ..functions.text import canonicalize
    from .lsh import _empty_pairs
    from ..state.joins import filter_by_key_shards, sharded_key_refs
    import ray.data as rd
    if n_pairs is None:
        n_pairs = cand_pairs_ds.count()
    if n_pairs == 0:
        return rd.from_arrow(_empty_pairs())

    broadcastable = 2 * n_pairs <= cfg.broadcast_cap
    if broadcastable:
        ids = collect_ids(cand_pairs_ds)
        refs = [ray.put(ids)]
    else:
        refs = sharded_key_refs(pair_id_ds_local(cand_pairs_ds),
                                "doc_id", cfg.join_buckets)

    def _canon(batch: pa.Table) -> pa.Table:
        texts = [canonicalize(t if t is not None else "")
                 for t in batch.column("content").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "content_canon": pa.array(texts, pa.large_string())})

    subset = filter_by_key_shards(
        winners_ds, "doc_id", refs).map_batches(
        _canon, batch_format="pyarrow").materialize()

    if broadcastable:
        # the id cap bounds the COUNT; bytes are capped separately — large
        # documents switch to the bucketed join long before the id cap.
        # The bound comes from the materialized subset's block METADATA
        # (size_bytes: content + an ~1% doc_id/offsets overhead) — free,
        # instead of a dedicated nbytes aggregation job re-scanning the
        # subset (VERDICT r2 #6: fuse the nbytes aggregate into the
        # subset build).  Both plans are byte-identical in output, so the
        # slightly conservative gate can only flip plan choice near the
        # cap, never the result.
        total_bytes = int(subset.size_bytes() or 0)
        if total_bytes <= cfg.broadcast_bytes_cap:
            from ..state.joins import build_broadcast

            def _build(tables):
                id_parts, text_parts = [], []
                for b in tables:
                    if b.num_rows == 0:
                        continue
                    col = b.column("content_canon")
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    id_parts.append(b.column("doc_id").to_numpy(
                        zero_copy_only=False))
                    text_parts.append(col)
                ids_arr = (np.concatenate(id_parts) if id_parts
                           else np.empty(0, np.int64))
                order = np.argsort(ids_arr, kind="stable")
                texts_all = (pa.concat_arrays(text_parts) if text_parts
                             else pa.array([], pa.large_string()))
                return (ids_arr[order],
                        texts_all.take(pa.array(order, pa.int64())))

            probe_ref = build_broadcast(subset, _build)

            def _confirm(batch: pa.Table) -> pa.Table:
                sids, stexts = ray.get(probe_ref)
                a_arr = batch.column("a").to_numpy(zero_copy_only=False)
                b_arr = batch.column("b").to_numpy(zero_copy_only=False)
                if len(sids) == 0:
                    return _empty_pairs()
                pa_ = np.minimum(np.searchsorted(sids, a_arr),
                                 len(sids) - 1)
                pb_ = np.minimum(np.searchsorted(sids, b_arr),
                                 len(sids) - 1)
                hit = (sids[pa_] == a_arr) & (sids[pb_] == b_arr)
                ta = stexts.take(pa.array(pa_, pa.int64())).to_pylist()
                tb = stexts.take(pa.array(pb_, pa.int64())).to_pylist()
                keep = _substring_keep(ta, tb) & hit
                return _mark_contained(batch.filter(pa.array(keep)))

            return cand_pairs_ds.map_batches(_confirm,
                                             batch_format="pyarrow",
                                             batch_size=4096)

    # ---- grid content join (count or bytes over cap) --------------------
    # Only the slim pair rows shuffle; candidate content is sharded once
    # by builder tasks and read zero-copy per grid cell — canonical text
    # never rides a sort shuffle (state/joins.grid_pair_apply).
    from ..state.joins import grid_pair_apply

    def _confirm_cell(cell: pa.Table, sa, sb) -> pa.Table:
        if cell.num_rows == 0 or sa[1] is None or sb[1] is None:
            return _empty_pairs()
        ids_a, tbl_a = sa
        ids_b, tbl_b = sb
        a_arr = cell.column("a").to_numpy(zero_copy_only=False)
        b_arr = cell.column("b").to_numpy(zero_copy_only=False)
        ia = np.minimum(np.searchsorted(ids_a, a_arr), len(ids_a) - 1)
        ib = np.minimum(np.searchsorted(ids_b, b_arr), len(ids_b) - 1)
        hit = (ids_a[ia] == a_arr) & (ids_b[ib] == b_arr)
        col_a = tbl_a.column("content_canon")
        col_b = tbl_b.column("content_canon")
        if isinstance(col_a, pa.ChunkedArray):
            col_a = col_a.combine_chunks()
        if isinstance(col_b, pa.ChunkedArray):
            col_b = col_b.combine_chunks()
        ta = col_a.take(pa.array(ia, pa.int64())).to_pylist()
        tb = col_b.take(pa.array(ib, pa.int64())).to_pylist()
        keep = _substring_keep(ta, tb) & hit
        return _mark_contained(cell.filter(pa.array(keep)))

    return grid_pair_apply(cand_pairs_ds, subset, _confirm_cell,
                           k=cfg.grid_k)


def pair_id_ds_local(pairs_ds):
    from .lsh import pair_id_ds
    return pair_id_ds(pairs_ds)
