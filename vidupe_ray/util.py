"""Small shared utilities for entry points (bench/CLI/tools)."""

from __future__ import annotations

import logging


class _SchemaUnifyFilter(logging.Filter):
    """Drops Ray 2.49's per-bundle schema-unification warning
    ("Operator produced a RefBundle with a different schema...").

    Two benign producers trigger it on this engine's plans (VERDICT r3
    #8 bench-tail hygiene):

    - Ray's own sort-shuffle reduce emits ZERO-FIELD empty blocks for
      empty partitions (tiny aggregates with fewer groups than
      partitions — per-lang stats, grid cells), logged as
      "new schema: ." — there is nothing upstream code can type.
    - fused Filter->Project chains interleave pre- and post-projection
      bundles in one operator stream (winner anti-join, pair column
      selects).

    Both unify downstream and every affected output is hash-checked
    against DuckDB, so the warning is noise here; REAL schema bugs still
    surface as CORRECTNESS failures.  The filter is opt-in per entry
    point — library code never touches logging config.
    """

    _NEEDLE = "produced a RefBundle with a different schema"

    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        return self._NEEDLE not in record.getMessage()


def silence_benign_schema_warnings() -> None:
    """Install the RefBundle schema-unification filter on Ray Data's
    streaming-executor logger (idempotent)."""
    for name in ("ray.data._internal.execution.streaming_executor_state",
                 "ray.data"):
        lg = logging.getLogger(name)
        if not any(isinstance(f, _SchemaUnifyFilter) for f in lg.filters):
            lg.addFilter(_SchemaUnifyFilter())
