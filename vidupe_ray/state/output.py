"""Resumable partitioned parquet output (task brief: 'write partitioned
Parquet so a failed run can skip finished partitions; never one giant
file').

Rows are hash-partitioned on a key column into ``buckets`` partitions;
each partition is written by the task that owns its bucket (inside the
one grouped_map shuffle) as ``part-<b>.parquet`` via scratch-file +
atomic rename, with the data file itself as the completion marker.  A
re-run with the same ``out_dir``:

- skips every partition whose file already exists (finished before the
  crash),
- writes only the missing ones,

so output cost after a failure is proportional to the UNFINISHED work.
The returned manifest (one row per partition) records rows/bytes/skipped
per partition — the per-partition lineage the north rule asks for.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import bucketing as B


def resumable_write(ds, out_dir: str, key_col: str,
                    buckets: int = 64,
                    identity: str | None = None) -> pd.DataFrame:
    """Write ``ds`` as ``out_dir/part-<bucket>.parquet`` keyed by
    ``hash(key_col) % buckets``; returns the manifest DataFrame
    (partition, rows, bytes, skipped) and writes it as
    ``out_dir/MANIFEST.parquet``.

    ``identity`` is the dataset identity key (corpus key + config hash):
    existing partitions are only SKIPPED when the directory's recorded
    identity matches — a re-run into the same ``out_dir`` after the
    corpus, config or code changed wipes the stale partitions instead of
    silently mixing them with fresh ones (ADVICE r2).  Skipped rows
    report the EXISTING file's row count, so the manifest always
    describes what is actually on disk.
    """
    os.makedirs(out_dir, exist_ok=True)
    id_path = os.path.join(out_dir, "_IDENTITY")
    prev = None
    if os.path.exists(id_path):
        try:
            with open(id_path) as fh:
                prev = fh.read()
        except OSError:
            prev = None
    if identity is not None and prev != identity:
        # identity mismatch (or unidentified leftovers): existing parts
        # cannot be trusted as THIS dataset's partitions -> wipe, rewrite
        for stale in [f for f in os.listdir(out_dir)
                      if f.startswith(("part-", "tmp-"))
                      or f == "MANIFEST.parquet"]:
            try:
                os.remove(os.path.join(out_dir, stale))
            except OSError:
                pass
        tmp_id = id_path + ".tmp"
        with open(tmp_id, "w") as fh:
            fh.write(identity)
        os.rename(tmp_id, id_path)
    for stale in [f for f in os.listdir(out_dir) if f.startswith("tmp-")]:
        try:
            os.remove(os.path.join(out_dir, stale))
        except OSError:
            pass

    def _write_bucket(t: pa.Table) -> pd.DataFrame:
        b = int(B.bucket_of_ints(
            t.column(key_col).to_numpy(zero_copy_only=False)[:1],
            buckets)[0]) if t.num_rows else -1
        path = os.path.join(out_dir, f"part-{b:05d}.parquet")
        if os.path.exists(path):
            meta = pq.read_metadata(path)
            return pd.DataFrame({"partition": [b],
                                 "rows": [meta.num_rows],
                                 "bytes": [0], "skipped": [True]})
        tmp = os.path.join(out_dir, f"tmp-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(t, tmp)
        nbytes = os.path.getsize(tmp)
        os.rename(tmp, path)
        return pd.DataFrame({"partition": [b], "rows": [t.num_rows],
                             "bytes": [nbytes], "skipped": [False]})

    # one bucket == one partition == one writer task; the bucket value is
    # constant within the group, so the first row's hash identifies it
    manifest_parts = B.grouped_map(
        ds, key_col, B.bucket_of_ints, _write_bucket,
        num_buckets=buckets, batch_format="pyarrow").take_all()
    manifest = (pd.DataFrame(manifest_parts)
                .sort_values("partition").reset_index(drop=True))
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   os.path.join(out_dir, "MANIFEST.parquet"))
    return manifest


def read_partitioned(out_dir: str):
    """Read back a resumable_write directory (data parts only)."""
    import glob
    import ray.data as rd
    return rd.read_parquet(sorted(
        glob.glob(os.path.join(out_dir, "part-*.parquet"))))
