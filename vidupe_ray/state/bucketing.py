"""Bucketed group processing — the scale-critical replacement for
per-group ``map_groups`` calls.

A ``groupby(key).map_groups(fn)`` with millions of tiny groups (one per LSH
band key, per content hash, per graph node) pays per-group Python/Arrow
overhead that dwarfs the useful work.  Instead we shuffle on
``hash(key) % num_buckets`` — a SMALL, uniform key space — and hand each
bucket (thousands of groups) to one vectorized callable that does the
per-group logic with numpy segment operations / pandas C-level groupby.

Same shuffle volume, ~1000x fewer Python crossings.  This is also the
unit of skew control: bucket population is n/num_buckets by uniform hash
regardless of group-size skew in the original key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import mix64, U64

BUCKET_COL = "__bucket__"


def bucket_of_ints(x: np.ndarray, num_buckets: int) -> np.ndarray:
    return (mix64(x.astype(np.int64).view(U64))
            % U64(num_buckets)).astype(np.int64)


def bucket_of_strings(s, num_buckets: int) -> np.ndarray:
    from pandas.util import hash_array
    arr = np.asarray(s, dtype=object)
    return (hash_array(arr, categorize=False).astype(U64)
            % U64(num_buckets)).astype(np.int64)


def grouped_map(ds, key_col: str, bucket_fn, apply_fn,
                num_buckets: int = 64, batch_format: str = "pyarrow"):
    """groupby-equivalent over huge key cardinality.

    ``bucket_fn(column_values) -> int64 bucket ids`` (use the helpers);
    ``apply_fn(bucket_table)`` must do its own per-key grouping internally
    (the key column is still present) and may return any schema.
    """
    def _tag(batch: pa.Table) -> pa.Table:
        vals = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            BUCKET_COL, pa.array(bucket_fn(vals, num_buckets), pa.int64()))

    def _apply(group):
        if isinstance(group, pa.Table):
            group = group.drop_columns([BUCKET_COL])
        else:
            group = group.drop(columns=[BUCKET_COL])
        return apply_fn(group)

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby(BUCKET_COL).map_groups(
        _apply, batch_format=batch_format)


def segment_boundaries(sorted_keys: np.ndarray) -> np.ndarray:
    """Offsets of equal-key runs in a sorted array: [0, ..., n]."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)


def segment_pairs(segments: np.ndarray, cap: int) -> tuple:
    """All within-segment index pairs (i < j) for a (k, 2) array of
    [start, end) segments, vectorized per segment; segments larger than
    ``cap`` use ring-linking with a window keeping ~cap^2 comparisons
    (hot-group skew control — the returned ``capped`` mask lets the caller
    count drops; never silent)."""
    i_parts, j_parts = [], []
    capped = np.zeros(len(segments), dtype=bool)
    for s in range(len(segments)):
        lo, hi = int(segments[s, 0]), int(segments[s, 1])
        g = hi - lo
        if g < 2:
            continue
        if g <= cap:
            i, j = np.triu_indices(g, k=1)
        else:
            capped[s] = True
            w = max(1, (cap * cap) // g)
            i = np.concatenate([np.arange(0, g - off)
                                for off in range(1, w + 1)])
            j = np.concatenate([np.arange(off, g)
                                for off in range(1, w + 1)])
        i_parts.append(i + lo)
        j_parts.append(j + lo)
    if not i_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e, capped
    return (np.concatenate(i_parts), np.concatenate(j_parts), capped)
