"""Corpus sources — read + adapt input tables to the canonical schema.

The discovery analogue (``findVideos``, ``mainwindow.cpp:206-230``): the
corpus is already a Parquet table; Ray's parquet reader supplies the
file-listing parallelism, and the lang allowlist (extensions.ini analogue)
is pushed into the scan as a row filter so pruned rows never leave storage.
"""

from __future__ import annotations

import pyarrow.dataset as pads
import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(paths, lang_allowlist: tuple = (),
                columns=None):
    """read_parquet with column pruning + lang predicate pushdown."""
    kw = {}
    if lang_allowlist:
        kw["filter"] = pads.field("lang").isin(list(lang_allowlist))
    return rd.read_parquet(paths, columns=columns or CORPUS_COLUMNS, **kw)


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
        n = batch.num_rows
        src = batch.column("source").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "repo": pa.array(src, pa.string()),
            "path": pa.array([f"{s}/doc{d}.txt" for s, d in zip(src, ids)],
                             pa.string()),
            "commit": pa.array(["0" * 40] * n, pa.string()),
            "lang": batch.column("lang"),
            "content": batch.column("text"),
            "doc_id": batch.column("doc_id"),
        })

    return ds.map_batches(_adapt, batch_format="pyarrow")
