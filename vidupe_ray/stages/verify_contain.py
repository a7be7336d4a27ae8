"""Containment confirm — the substring pass (north rule; SURVEY.md §2.5 J5).

The CutEnds partial-overlap semantic (``thumbnail.h:26``,
``comparison.cpp:133-151``) generalized: a doc embedded verbatim inside a
larger doc is a duplicate even when whole-doc Jaccard is far below
threshold.  Candidates come from the anchor channel; here each candidate
pair is confirmed by an EXACT substring check on canonical text (the
suffix-array semantics; CPython's two-way string search plays the role of
the suffix automaton — O(n+m) worst case, no index build).

Content is re-joined for candidate docs only (wide-record management,
SURVEY.md §7.4): the candidate id set is collected (it is many orders of
magnitude smaller than the corpus), content is fetched by a broadcast
semi-join, and shipped to the confirm tasks via one ``ray.put``.
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


def confirm_containment(cand_pairs_ds, winners_ds, cfg: PipelineConfig):
    """contain_cand pairs + winner rows -> confirmed 'contain' pairs.

    ``winners_ds`` carries raw ``content`` (plus doc_id); candidates are
    few, so their content is fetched by broadcast semi-join and
    canonicalized on the fly (same canonical form the fingerprints used).
    """
    from ..functions.text import canonicalize
    ids = collect_ids(cand_pairs_ds)
    if len(ids) == 0:
        from .lsh import _empty_pairs
        import ray.data as rd
        return rd.from_arrow(_empty_pairs())
    if len(ids) > cfg.broadcast_cap:
        raise ValueError(
            f"{len(ids)} containment-candidate docs exceed broadcast_cap; "
            "raise the cap or enable the bucketed content join")

    ids_sorted = np.sort(ids)
    ref_ids = ray.put(ids_sorted)

    def _grab(batch: pa.Table) -> pa.Table:
        want = ray.get(ref_ids)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(want, d), len(want) - 1)
        sel = batch.filter(pa.array(want[pos] == d))
        texts = [canonicalize(t if t is not None else "")
                 for t in sel.column("content").to_pylist()]
        return pa.table({"doc_id": sel.column("doc_id"),
                         "content_canon": pa.array(texts, pa.string())})

    subset = winners_ds.map_batches(_grab, batch_format="pyarrow")
    content = {}
    for b in subset.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for did, text in zip(b.column("doc_id").to_pylist(),
                             b.column("content_canon").to_pylist()):
            content[did] = text
    content_ref = ray.put(content)

    def _confirm(batch: pa.Table) -> pa.Table:
        lookup = ray.get(content_ref)
        a_arr = batch.column("a").to_numpy(zero_copy_only=False)
        b_arr = batch.column("b").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(a_arr), dtype=bool)
        for i, (a, b_) in enumerate(zip(a_arr, b_arr)):
            ta = lookup.get(a)
            tb = lookup.get(b_)
            if ta is None or tb is None:
                continue
            small, big = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
            keep[i] = bool(small) and small in big
        out = batch.filter(pa.array(keep))
        ki = out.schema.get_field_index("kind")
        return out.set_column(ki, "kind",
                              pa.array(["contain"] * out.num_rows,
                                       pa.string()))

    return cand_pairs_ds.map_batches(_confirm, batch_format="pyarrow",
                                     batch_size=4096)
