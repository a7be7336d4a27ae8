"""Partitioned join utilities — the explicit scale path when a broadcast
join would not fit (ray_guide.md 'Joins and lookups').

Five primitives cover every join in the engine; each is cap-gated by the
caller (broadcast below ``cfg.broadcast_cap``, these above it):

- ``sharded_key_refs`` + ``filter_by_key_shards`` — semi/anti join of a
  WIDE dataset against a key set, without shuffling the wide side and
  without the key set EVER touching the driver: builder tasks shard
  chunks of key blocks into per-bucket sorted-distinct partials
  (``num_returns=buckets``), per-bucket merge tasks union them, and each
  wide-side task probes only its rows' buckets.  Two fully-parallel task
  waves; the driver holds ObjectRefs only.
- ``bucketed_enrich`` — payload gather (the lookup join): left and right
  are tagged, unioned, and shuffled ONCE on ``hash(key) % buckets``; each
  bucket matches left rows to right payload with a vectorized sorted-array
  probe.  No driver-side materialization of either side.
- ``lookup_join`` — the (key -> value) map join used by cluster
  assignment: broadcast when the map fits ``cap`` (one ``ray.put``,
  vectorized gather per batch), ``bucketed_enrich`` above it.  Missing
  keys default to the key itself (the singleton-maps-to-self semantic).
- ``grid_pair_apply`` — the two-key payload join (pair verification /
  containment): slim pair rows shuffle into a k x k grid of cells while
  the payload is sharded once by builder tasks and read zero-copy per
  cell — heavy columns never ride a sort shuffle.
- ``build_broadcast`` — under-cap fast path: the probe structure is
  built in ONE remote task from materialized block refs (the driver
  never streams the data; workers never each rebuild it).

Group size under ``bucketed_enrich`` is ``n / buckets`` by uniform hash
(doc_id is itself a hash), so key skew cannot blow up one reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .bucketing import bucket_of_ints, grouped_map

_JK = "__jk__"
_SIDE = "__side__"


def _arrow_schema(ds) -> tuple:
    """(ds, pa.Schema) — converts pandas-block datasets to Arrow blocks
    first (schema-driven union building needs real Arrow types)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if not isinstance(base, pa.Schema):
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
    return ds, base


# --------------------------------------------------------------------------
# semi / anti join by key shards (wide side never shuffles)
# --------------------------------------------------------------------------

def _key_shard_builder(key_col: str, buckets: int):
    from .bucketing import as_arrow_block

    @ray.remote(num_cpus=1)
    def _build(*blocks):
        tables = [as_arrow_block(b) for b in blocks]
        parts = [t.column(key_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64) for t in tables if t.num_rows]
        if not parts:
            v = np.empty(0, np.int64)
        else:
            v = np.unique(np.concatenate(parts))   # sorted + distinct
        if buckets == 1:
            return v            # bare array (num_returns stays 1)
        b = bucket_of_ints(v, buckets)
        # boolean-mask selection of a sorted array stays sorted
        return tuple(v[b == bb] for bb in range(buckets))
    return _build


@ray.remote(num_cpus=1)
def _merge_key_shard(*partials):
    parts = [p for p in partials if len(p)]
    if not parts:
        return np.empty(0, np.int64)
    if len(parts) == 1:
        return parts[0]
    return np.unique(np.concatenate(parts))


def sharded_key_refs(keys_ds, key_col: str, buckets: int,
                     blocks_per_builder: int = 8) -> list:
    """Distinct int64 keys of ``keys_ds`` -> per-bucket sorted uint-hash
    shards in the object store; returns ``[ObjectRef] * buckets``.

    Fully distributed two-wave task plan (no key ever passes through the
    driver — at 100-TB key cardinality a driver stream would be the
    bottleneck): builder tasks each take a chunk of materialized key
    blocks and emit ``buckets`` sorted-distinct partials
    (``num_returns=buckets``); one merge task per bucket unions its
    partials.  Both waves run fully parallel; the driver only holds
    ObjectRefs.
    """
    mat = keys_ds.materialize()        # slim key column only
    block_refs = list(mat.to_arrow_refs())
    if not block_refs:
        empty = ray.put(np.empty(0, np.int64))
        return [empty] * buckets
    builder = _key_shard_builder(key_col, buckets)
    partial_refs = []
    for i in range(0, len(block_refs), blocks_per_builder):
        chunk = block_refs[i:i + blocks_per_builder]
        if buckets == 1:
            partial_refs.append([builder.remote(*chunk)])
        else:
            partial_refs.append(list(
                builder.options(num_returns=buckets).remote(*chunk)))
    if len(partial_refs) == 1:
        return partial_refs[0]
    return [_merge_key_shard.remote(*[p[b] for p in partial_refs])
            for b in range(buckets)]


def filter_by_key_shards(ds, key_col: str, shard_refs: list,
                         invert: bool = False):
    """Keep (or drop, ``invert=True``) rows whose ``key_col`` appears in the
    sharded key set — in place, no shuffle of ``ds``."""
    buckets = len(shard_refs)

    def _filter(batch: pa.Table) -> pa.Table:
        d = batch.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.zeros(len(d), dtype=bool)
        db = (bucket_of_ints(d, buckets) if buckets > 1
              else np.zeros(len(d), dtype=np.int64))
        for b in np.unique(db):
            shard = ray.get(shard_refs[int(b)])
            if len(shard) == 0:
                continue
            sel = db == b
            pos = np.minimum(np.searchsorted(shard, d[sel]), len(shard) - 1)
            mask[sel] = shard[pos] == d[sel]
        return batch.filter(pa.array(~mask if invert else mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def semi_join_keys(ds, key_col: str, keys_ds, keys_col: str,
                   cfg, invert: bool = False, n_keys: int | None = None):
    """Cap-gated semi/anti join of ``ds`` against the keys of ``keys_ds``.

    ``n_keys`` (if already known) avoids a count pass; the bucket count is
    1 (single broadcast shard) below ``cfg.broadcast_cap`` and
    ``cfg.join_buckets`` above — driver memory stays one shard either way.
    """
    if n_keys is None:
        n_keys = keys_ds.count()
    buckets = 1 if n_keys <= cfg.broadcast_cap else cfg.join_buckets
    refs = sharded_key_refs(keys_ds, keys_col, buckets)
    return filter_by_key_shards(ds, key_col, refs, invert=invert)


# --------------------------------------------------------------------------
# bucketed payload gather (the lookup join that never broadcasts)
# --------------------------------------------------------------------------

def bucketed_enrich(left_ds, left_key: str, right_ds, right_key: str,
                    payload: dict, buckets: int = 64):
    """Append right-side ``payload`` columns ({right_name: out_name}) onto
    left rows by key equality via ONE tagged-union bucketed shuffle.

    Right keys must be unique (mapping semantics; first match wins
    otherwise).  Left rows with no match get nulls.  Neither side is ever
    collected; per-bucket work is a vectorized sorted-array probe + Arrow
    ``take``.
    """
    left_ds, lsch = _arrow_schema(left_ds)
    right_ds, rsch = _arrow_schema(right_ds)
    left_names = list(lsch.names)
    out_names = list(payload.values())
    right_names = list(payload.keys())
    out_types = {payload[rn]: rsch.field(rn).type for rn in right_names}
    out_schema = pa.schema(
        [lsch.field(nm) for nm in left_names]
        + [pa.field(on, out_types[on]) for on in out_names])

    def _tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t.column(left_key).to_numpy(zero_copy_only=False)
        cols = {_JK: pa.array(k.astype(np.int64), pa.int64()),
                _SIDE: pa.array(np.zeros(n, np.int8), pa.int8())}
        for nm in left_names:
            cols[nm] = t.column(nm)
        for on in out_names:
            cols[on] = pa.nulls(n, out_types[on])
        return pa.table(cols)

    def _tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t.column(right_key).to_numpy(zero_copy_only=False)
        cols = {_JK: pa.array(k.astype(np.int64), pa.int64()),
                _SIDE: pa.array(np.ones(n, np.int8), pa.int8())}
        for nm in left_names:
            cols[nm] = pa.nulls(n, lsch.field(nm).type)
        for rn in right_names:
            cols[payload[rn]] = t.column(rn)
        return pa.table(cols)

    union = (left_ds.map_batches(_tag_left, batch_format="pyarrow")
             .union(right_ds.map_batches(_tag_right,
                                         batch_format="pyarrow")))

    def _apply(t: pa.Table) -> pa.Table:
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        left = t.filter(pa.array(side == 0))
        if left.num_rows == 0:
            return out_schema.empty_table()
        right = t.filter(pa.array(side == 1))
        lk = left.column(_JK).to_numpy(zero_copy_only=False)
        rk = right.column(_JK).to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk_sorted = rk[order]
        if len(rk_sorted):
            pos = np.minimum(np.searchsorted(rk_sorted, lk),
                             len(rk_sorted) - 1)
            hit = rk_sorted[pos] == lk
            src = order[pos]
        else:
            hit = np.zeros(len(lk), dtype=bool)
            src = np.zeros(len(lk), dtype=np.int64)
        idx = pa.array(src, pa.int64(), mask=~hit)
        cols = {nm: left.column(nm) for nm in left_names}
        for on in out_names:
            rc = right.column(on)
            if isinstance(rc, pa.ChunkedArray):
                rc = rc.combine_chunks()
            cols[on] = (rc.take(idx) if len(rk_sorted)
                        else pa.nulls(left.num_rows, out_types[on]))
        return pa.table(cols, schema=out_schema)

    return grouped_map(union, _JK, bucket_of_ints, _apply,
                       num_buckets=buckets, batch_format="pyarrow")


def lookup_join(left_ds, key_col: str, mapping_ds, map_key: str,
                map_val: str, out_col: str, cfg,
                n_map: int | None = None):
    """(key -> value) map join onto ``left_ds``; missing keys map to the
    key itself.  Broadcast below ``cfg.broadcast_cap`` map rows, one
    ``bucketed_enrich`` shuffle above."""
    if n_map is None:
        n_map = mapping_ds.count()
    if n_map <= cfg.broadcast_cap:
        keys_ref, vals_ref, _ = broadcast_lookup_map(
            mapping_ds, map_key, map_val, cfg.broadcast_cap)

        def _join(batch: pa.Table) -> pa.Table:
            ids = batch.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = apply_lookup(ids, keys_ref, vals_ref)
            return batch.append_column(out_col, pa.array(v, pa.int64()))

        return left_ds.map_batches(_join, batch_format="pyarrow")

    slim = mapping_ds.select_columns([map_key, map_val])
    joined = bucketed_enrich(left_ds, key_col, slim, map_key,
                             {map_val: out_col}, buckets=cfg.join_buckets)

    def _fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = pc.coalesce(batch.column(out_col),
                        pc.cast(batch.column(key_col), pa.int64()))
        i = batch.schema.get_field_index(out_col)
        return batch.set_column(i, out_col, pc.cast(v, pa.int64()))

    return joined.map_batches(_fill, batch_format="pyarrow")


# --------------------------------------------------------------------------
# grid pair join: slim-only shuffle for two-key payload joins
# --------------------------------------------------------------------------

_SHARD_CACHE: dict = {}
_SHARD_CACHE_BYTES = 0
# byte-bounded eviction (ADVICE r2): entry-count FIFO let one worker pin
# ~3x the candidate payload at grid_k=8; cap the cache by cumulative
# payload bytes instead (~1/8 of a worker heap at Ray's 2 GiB default)
_SHARD_CACHE_MAX_BYTES = 256 << 20


def _entry_nbytes(hit) -> int:
    ids, tbl = hit
    return int(ids.nbytes) + int(tbl.nbytes if tbl is not None else 0)


def _grid_builder_fn(k: int, right_key: str):
    from .bucketing import as_arrow_block

    @ray.remote(num_cpus=1)
    def _builder(*blocks):
        tables = [as_arrow_block(b) for b in blocks]
        # a builder chunk can be ALL empty blocks (sparse candidates after
        # filter_by_key_shards routinely leave runs of empty blocks) —
        # concat_tables([]) raises, so build the non-empty list first
        parts = [x for x in tables if x.num_rows]
        if not parts:
            empty = tables[0].schema.empty_table()
            return tuple((np.empty(0, np.int64), empty)
                         for _ in range(k))
        t = pa.concat_tables(parts)
        ids = t.column(right_key).to_numpy(zero_copy_only=False)
        b = bucket_of_ints(ids, k)
        outs = []
        for bb in range(k):
            sel = np.flatnonzero(b == bb)
            ids_s = ids[sel]
            order = np.argsort(ids_s, kind="stable")
            sub = t.take(pa.array(sel[order], pa.int64()))
            outs.append((ids_s[order], sub))
        return tuple(outs)
    return _builder


def _merged_shard(refs_token, bucket: int, shard_refs):
    """Per-process cache of the merged (sorted ids, payload table) for one
    grid bucket — cells sharing a bucket (on either side) re-use the
    merge."""
    global _SHARD_CACHE_BYTES
    key = (refs_token, bucket)
    hit = _SHARD_CACHE.get(key)
    if hit is None:
        parts = ray.get([r[bucket] for r in shard_refs])
        ids = np.concatenate([p[0] for p in parts]) if parts else \
            np.empty(0, np.int64)
        tbls = [p[1] for p in parts if p[1].num_rows]
        order = np.argsort(ids, kind="stable")
        tbl = (pa.concat_tables(tbls).take(pa.array(order, pa.int64()))
               if tbls else None)
        hit = (ids[order], tbl)
        nb = _entry_nbytes(hit)
        while _SHARD_CACHE and \
                _SHARD_CACHE_BYTES + nb > _SHARD_CACHE_MAX_BYTES:
            old = _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))   # FIFO
            _SHARD_CACHE_BYTES -= _entry_nbytes(old)
        _SHARD_CACHE[key] = hit
        _SHARD_CACHE_BYTES += nb
    return hit


def grid_pair_apply(pairs_ds, right_ds, apply_fn, k: int = 8,
                    right_key: str = "doc_id",
                    a_col: str = "a", b_col: str = "b",
                    blocks_per_builder: int = 8,
                    cell_payload_budget: int = 384 << 20,
                    max_k: int = 32):
    """Two-key payload join where ONLY THE SLIM PAIR ROWS SHUFFLE.

    The naive plan enriches pairs twice (``bucketed_enrich`` on a, then
    b), dragging the payload (1 KiB MinHash signatures, document content)
    through two sort shuffles.  Here:

    1. ``right_ds`` (materialized) is split into per-bucket sorted shards
       by a handful of builder TASKS (``num_returns=k`` each) — payload
       never crosses a shuffle, builders hold only their own blocks.
    2. pairs are tagged with cell ``bucket(a) * k + bucket(b)`` and
       grouped by cell — a shuffle of the tiny pair rows only.
    3. each cell task merges its two buckets' shard partials (zero-copy
       plasma reads, per-process cached — cells sharing a bucket reuse
       the merge) and calls
       ``apply_fn(cell_tbl, (ids_a, tbl_a), (ids_b, tbl_b))``.

    The partitioning assumption: ``right_key`` is unique per row (doc_id);
    payload volume read per cell is ``|right| / k`` per side.

    ``k`` AUTO-SCALES with the materialized payload so one cell's merged
    shard stays under ``cell_payload_budget`` heap bytes: each cell task
    merge-copies ~payload/k per side into its worker heap, and with 32
    concurrent cell tasks a fixed k=8 at 10M docs put ~3.7 GB anon heap
    in EVERY worker and OOM-wedged a 125 GB box (kernel oom-kill,
    measured).  Worker heap is a per-node constant while payload grows
    with data — k must scale or the join has a ceiling.
    """
    mat = right_ds.materialize()
    payload_bytes = mat.size_bytes() or 0
    # each cell merges BOTH sides, so size the fit against half the
    # budget (~2x cell_payload_budget actual heap otherwise; ADVICE r3)
    k_fit = int(np.ceil(2 * payload_bytes / max(cell_payload_budget, 1)))
    k = int(np.clip(max(k, k_fit), k, max_k))
    if k_fit > max_k:
        # the budget stops holding once payload > max_k * budget / 2:
        # per-cell heap grows with data again beyond this point (the
        # residual ceiling) — surface it, never silent (ADVICE r3 #2)
        import logging
        logging.getLogger("vidupe_ray.joins").warning(
            "grid_pair_apply: payload %.1f GiB needs k=%d to hold the "
            "%.0f MiB two-sided cell budget, but max_k=%d caps it — "
            "per-cell heap ~%.0f MiB; raise max_k or the budget",
            payload_bytes / (1 << 30), k_fit,
            cell_payload_budget / (1 << 20), max_k,
            2 * payload_bytes / max_k / (1 << 20))
    block_refs = list(mat.to_arrow_refs())
    builder = _grid_builder_fn(k, right_key)
    shard_refs = []
    for i in range(0, max(len(block_refs), 1), blocks_per_builder):
        chunk = block_refs[i:i + blocks_per_builder]
        if not chunk:
            continue
        shard_refs.append(list(
            builder.options(num_returns=k).remote(*chunk)))
    refs_ref = ray.put(shard_refs)
    token = refs_ref.hex() if hasattr(refs_ref, "hex") else str(refs_ref)

    def _tag(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False)
        b = t.column(b_col).to_numpy(zero_copy_only=False)
        cell = (bucket_of_ints(a, k) * k + bucket_of_ints(b, k))
        return t.append_column("__cell__", pa.array(cell, pa.int64()))

    tagged = pairs_ds.map_batches(_tag, batch_format="pyarrow")

    def _apply(t: pa.Table) -> pa.Table:
        cell = int(t.column("__cell__")[0].as_py())
        t = t.drop_columns(["__cell__"])
        refs = ray.get(refs_ref)
        sa = _merged_shard(token, cell // k, refs)
        sb = _merged_shard(token, cell % k, refs)
        return apply_fn(t, sa, sb)

    return grouped_map(tagged, "__cell__",
                       lambda v, n: v.astype(np.int64) % n, _apply,
                       num_buckets=k * k, batch_format="pyarrow")


# --------------------------------------------------------------------------
# worker-side dataset broadcast (no driver round-trip)
# --------------------------------------------------------------------------

def build_broadcast(ds, build_fn):
    """Materialize ``ds``, run ``build_fn(list[pa.Table]) -> probe`` in
    ONE remote task, and return the ObjectRef of the built probe.

    The probe is built exactly once (not per worker process — a
    per-process build of a multi-hundred-MB structure re-triggers this
    box's 32-way page-zeroing collapse), the driver never streams the
    data through itself, and consumers ``ray.get`` the single built
    object zero-copy from plasma.
    """
    mat = ds.materialize()
    refs = list(mat.to_arrow_refs())

    from .bucketing import as_arrow_block

    @ray.remote(num_cpus=1)
    def _build(*blocks):
        return build_fn([as_arrow_block(b) for b in blocks])

    return _build.remote(*refs)


# --------------------------------------------------------------------------
# broadcast small-side helpers (the fast path under the cap)
# --------------------------------------------------------------------------

def broadcast_lookup_map(mapping_ds, key_col: str, val_col: str,
                         cap: int) -> tuple:
    """Collect a small (key, value) dataset into a sorted-array pair and
    ``ray.put`` it; returns ``(keys_ref, vals_ref, count)``.

    The 'small side broadcast once' pattern — e.g. cluster parent pointers
    joined back onto the full doc table.  Callers must cap-gate (use
    ``lookup_join`` for the automatic switch); exceeding ``cap`` raises to
    catch un-gated call sites, never as a scale ceiling.
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
            "call through lookup_join() which switches to the bucketed "
            "join automatically")
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


def bucketed_semi_join(ds, key_values: np.ndarray, key_col: str,
                       buckets: int):
    """``ds`` rows whose ``key_col`` is in the (driver-resident) array
    ``key_values`` — retained for callers that already hold the ids; the
    streaming variant is ``semi_join_keys``."""
    key_values = np.unique(np.asarray(key_values, dtype=np.int64))
    if buckets <= 1:
        refs = [ray.put(key_values)]
    else:
        kb = bucket_of_ints(key_values, buckets)
        refs = [ray.put(key_values[kb == b]) for b in range(buckets)]
    return filter_by_key_shards(ds, key_col, refs)
