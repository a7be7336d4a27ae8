"""Corpus sources — read + adapt input tables to the canonical schema.

The discovery analogue (``findVideos``, ``mainwindow.cpp:206-230``): the
corpus is already a Parquet table; Ray's parquet reader supplies the
file-listing parallelism, and the lang allowlist (extensions.ini analogue)
is pushed into the scan as a row filter so pruned rows never leave storage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(paths, lang_allowlist: tuple = (),
                columns=None, num_blocks: int | None = None):
    """read_parquet with column pruning + lang predicate pushdown.

    ``num_blocks`` uses the reader's own row-group splitting
    (``override_num_blocks``) to land at the target block count WITHOUT
    the repartition all-to-all — measured 1.8 s vs 4.3-7.5 s for the
    500k-doc pin; pass it together with ``run_dedup(...,
    skip_repartition=True)``."""
    kw = {}
    if lang_allowlist:
        kw["filter"] = pads.field("lang").isin(list(lang_allowlist))
    if num_blocks:
        kw["override_num_blocks"] = num_blocks
    cols = columns or CORPUS_COLUMNS
    if columns is None:
        # optional mtime column (multi-attribute canonical pick): read it
        # when the source table carries one; absent -> normalize fills 0
        try:
            if "mtime" in pads.dataset(paths).schema.names:
                cols = cols + ["mtime"]
        except Exception:
            pass
    # pandas-written parquet attaches schema metadata (b'pandas': {...});
    # a pa.Schema WITH metadata is unhashable (hash() hits the dict), so
    # every downstream block concat logs "Failed to hash the schemas" and
    # skips its dedup fast path.  Strip it AT THE READ OPERATOR (clean
    # ``schema=`` -> reader emits clean blocks) rather than a post-read
    # map_batches: the returned handle must stay an untransformed read so
    # ``input_files()``-based size estimation keeps working (ADVICE r2).
    if "schema" not in kw:
        try:
            s = pads.dataset(paths).schema.remove_metadata()
            kw["schema"] = pa.schema([s.field(n) for n in cols])
        except Exception:
            pass
    return rd.read_parquet(paths, columns=cols, **kw)


def documents_as_corpus(sf_dir: str, lang_allowlist: tuple = ()):
    """Adapter: the driver-provided ``documents`` table
    (doc_id, text, lang, source, n_chars) viewed through the corpus schema.

    ``text`` -> ``content``; identity columns synthesized deterministically
    from (source, doc_id); the existing int64 doc_id is preserved so results
    join back to the original table trivially.
    """
    import pyarrow as pa
    kw = {}
    if lang_allowlist:
        kw["filter"] = pads.field("lang").isin(list(lang_allowlist))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"], **kw)

    def _adapt(batch: pa.Table) -> pa.Table:
        import numpy as np
        n = batch.num_rows
        src = batch.column("source").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        # deterministic pseudo-mtime (the documents table carries no
        # timestamp): one round of 32-bit multiplicative hashing of
        # doc_id, exactly replicable in SQL via HUGEINT arithmetic —
        # feeds the multi-attribute canonical pick (mtime asc)
        idv = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        mtime = ((idv * np.uint64(2654435761))
                 & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({
            "repo": pa.array(src, pa.string()),
            "path": pa.array([f"{s}/doc{d}.txt" for s, d in zip(src, ids)],
                             pa.string()),
            "commit": pa.array(["0" * 40] * n, pa.string()),
            "lang": batch.column("lang"),
            "content": batch.column("text"),
            "doc_id": batch.column("doc_id"),
            "mtime": pa.array(mtime, pa.int64()),
        })

    return ds.map_batches(_adapt, batch_format="pyarrow")


def corpus_sanity(corpus_ds, cfg=None) -> dict:
    """Ingest sanity report — the geometry-sanity analogue (SURVEY §2.3
    F4; the reference rejects videos with impossible width/height,
    ``video.cpp:31-35``).  Checks, all streaming:

    - null / empty identity columns (repo, path, commit)
    - null content (tagged later as rejects, but surfaced here up front)
    - duplicate doc_id (identity-hash collisions or repeated
      (repo, path, commit) rows — either corrupts clustering silently)

    Returns a counts dict; never raises (callers decide policy).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ..config import DEFAULT_CONFIG
    from ..stages.normalize import batch_doc_ids
    from ..state import bucketing as B
    cfg = cfg or DEFAULT_CONFIG

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bad_ident = np.zeros(n, dtype=bool)
        for c in ("repo", "path", "commit"):
            if c in batch.column_names:
                col = batch.column(c)
                vals = col.to_pylist()
                bad_ident |= np.array(
                    [v is None or v == "" for v in vals], dtype=bool)
        content = batch.column("content")
        null_content = np.array(
            [v is None for v in content.to_pylist()], dtype=bool)
        ids = batch_doc_ids(batch)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bad_ident": pa.array(bad_ident),
            "null_content": pa.array(null_content)})

    tagged = corpus_ds.map_batches(_partial, batch_format="pyarrow")

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        dupes = df["doc_id"].duplicated(keep=False)
        return pd.DataFrame({
            "n_rows": [len(df)],
            "n_bad_identity": [int(df["bad_ident"].sum())],
            "n_null_content": [int(df["null_content"].sum())],
            "n_dup_doc_id": [int(dupes.sum())]})

    per = B.grouped_map(tagged, "doc_id", B.bucket_of_ints, _bucket,
                        num_buckets=cfg.join_buckets,
                        batch_format="pandas")
    agg = per.sum(["n_rows", "n_bad_identity", "n_null_content",
                   "n_dup_doc_id"])
    return {"n_rows": int(agg["sum(n_rows)"] or 0),
            "n_bad_identity": int(agg["sum(n_bad_identity)"] or 0),
            "n_null_content": int(agg["sum(n_null_content)"] or 0),
            "n_dup_doc_id": int(agg["sum(n_dup_doc_id)"] or 0)}
