"""Partitioned join utilities — the explicit scale path when a broadcast
semi-join would not fit (ray_guide.md 'Joins and lookups').

All joins here are expressed as ONE ``groupby(bucket)`` shuffle over the
tagged union of both sides; group size is ``n / buckets`` by uniform hash, so
no key skew can blow up a single reducer (doc_id is itself a hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _bucket_col(ids: np.ndarray, buckets: int) -> np.ndarray:
    return (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            >> np.uint64(40)).astype(np.int64) % buckets


def bucketed_semi_join(ds, key_values: np.ndarray, key_col: str,
                       buckets: int):
    """``ds`` rows whose ``key_col`` is in ``key_values`` — key set sharded
    into per-bucket object-store refs so each task reads only its shard."""
    key_values = np.sort(np.asarray(key_values, dtype=np.int64))
    kb = _bucket_col(key_values, buckets)
    shard_refs = {b: ray.put(key_values[kb == b]) for b in range(buckets)}

    def _filter(batch: pa.Table) -> pa.Table:
        d = batch.column(key_col).to_numpy()
        db = _bucket_col(d, buckets)
        mask = np.zeros(len(d), dtype=bool)
        for b in np.unique(db):
            shard = ray.get(shard_refs[int(b)])
            if len(shard) == 0:
                continue
            sel = db == b
            pos = np.minimum(np.searchsorted(shard, d[sel]), len(shard) - 1)
            mask[sel] = shard[pos] == d[sel]
        return batch.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def broadcast_lookup_map(mapping_ds, key_col: str, val_col: str,
                         cap: int) -> tuple:
    """Collect a small (key, value) dataset into a sorted-array pair and
    ``ray.put`` it; returns ``(keys_ref, vals_ref, count)``.

    The 'small side broadcast once' pattern — e.g. cluster parent pointers
    joined back onto the full doc table.
    """
    keys, vals = [], []
    for b in mapping_ds.iter_batches(batch_size=1 << 20,
                                     batch_format="pandas"):
        keys.append(b[key_col].to_numpy(np.int64))
        vals.append(b[val_col].to_numpy(np.int64))
    k = np.concatenate(keys) if keys else np.empty(0, np.int64)
    v = np.concatenate(vals) if vals else np.empty(0, np.int64)
    if len(k) > cap:
        raise ValueError(
            f"broadcast map of {len(k)} rows exceeds cap {cap}; "
            "use a bucketed join for this stage at this scale")
    order = np.argsort(k, kind="stable")
    return ray.put(k[order]), ray.put(v[order]), len(k)


def apply_lookup(batch_ids: np.ndarray, keys_ref, vals_ref,
                 default: np.ndarray | None = None) -> np.ndarray:
    """Vectorized gather: value for each id, or ``default`` (or the id
    itself) when absent."""
    keys = ray.get(keys_ref)
    vals = ray.get(vals_ref)
    out = batch_ids.copy() if default is None else default.copy()
    if len(keys) == 0:
        return out
    pos = np.minimum(np.searchsorted(keys, batch_ids), len(keys) - 1)
    hit = keys[pos] == batch_ids
    out[hit] = vals[pos[hit]]
    return out
