"""Signature checkpointing — the ``cache.db`` analogue (``db.cpp:32-77``).

The reference caches per-video metadata + captures in SQLite keyed by
``md5(basename + mtime)`` with a ``version`` table guarding compatibility
(``db.cpp:22-30``, ``db.cpp:46-47``); a re-run skips straight to comparison
(">10x faster loading once cached", readme.md:35).

Here: the fingerprint stage writes its output dataset as partitioned
Parquet under ``<dir>/signatures/<signature_config_hash>/`` plus a
manifest recording the row count.  A re-run with the same signature config
(thresholds deliberately excluded — they are match-time-only parameters,
``mainwindow.cpp:110-121``) and the same winner count reads the checkpoint
instead of recomputing.  A config change lands in a different directory,
so stale entries are simply never read (the ``version``-table semantic).
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from ..config import PipelineConfig

_MANIFEST = "MANIFEST.json"


def _sig_dir(checkpoint_dir: str, cfg: PipelineConfig) -> str:
    return os.path.join(checkpoint_dir, "signatures",
                        cfg.signature_config_hash)


def try_read_signatures(checkpoint_dir: str, cfg: PipelineConfig,
                        n_winners: int):
    d = _sig_dir(checkpoint_dir, cfg)
    mpath = os.path.join(d, _MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("rows") != n_winners:
        return None          # input changed -> recompute
    return rd.read_parquet(os.path.join(d, "data"))


def write_signatures(signatures_ds, checkpoint_dir: str,
                     cfg: PipelineConfig, n_winners: int):
    """Write-then-manifest: the manifest lands only after the data is fully
    written, so a killed run leaves an ignorable partial directory."""
    d = _sig_dir(checkpoint_dir, cfg)
    data_dir = os.path.join(d, "data")
    os.makedirs(data_dir, exist_ok=True)
    signatures_ds.write_parquet(data_dir)
    with open(os.path.join(d, _MANIFEST), "w") as f:
        json.dump({"rows": n_winners,
                   "config_hash": cfg.signature_config_hash}, f)
    return rd.read_parquet(data_dir)


def write_lineage(checkpoint_dir: str, stage: str, record: dict):
    """Append one lineage/metrics record (JSONL) — the status-log sink
    analogue (``mainwindow.cpp:292-296``), structured."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps({"stage": stage, **record}) + "\n")
