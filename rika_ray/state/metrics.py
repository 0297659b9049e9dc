"""Extraction-rate metrics (operator A4, SURVEY.md §2.5).

Two surfaces:
- per-partition rates persisted in the checkpoint manifest
  (``checkpoint.run_partitioned_extraction``) — the durable lineage record;
- in-session per-stage breakdowns parsed from ``Dataset.stats()`` — the
  interactive tuning view this module provides.
"""

from __future__ import annotations

import re

_OP_RE = re.compile(
    r"Operator (\d+) (\S+):.* in ([0-9.]+)s", re.M
)
_ROWS_RE = re.compile(r"Output num rows per block:.*?, (\d+) total")


def stage_summary(stats_text: str) -> list[dict]:
    """Parse ``Dataset.stats()`` into per-operator rows:
    {operator, wall_s, rows, rows_per_sec}."""
    out = []
    blocks = stats_text.split("Operator ")
    for block in blocks[1:]:
        header = block.splitlines()[0]
        m = re.match(r"(\d+) (\S+):.* in ([0-9.]+)s", header)
        if not m:
            continue
        rows_m = _ROWS_RE.search(block)
        wall = float(m.group(3))
        rows = int(rows_m.group(1)) if rows_m else None
        out.append(
            {
                "operator": m.group(2),
                "wall_s": wall,
                "rows": rows,
                "rows_per_sec": round(rows / wall, 1) if rows and wall else None,
            }
        )
    return out


def extraction_metrics(extracted_ds) -> dict:
    """Consume-and-measure: returns total docs + per-stage breakdown for an
    (already executed) extracted Dataset. Call after a consuming op
    (write/count/take) — stats() reflects the last execution."""
    stats_text = extracted_ds.stats()
    stages = stage_summary(stats_text)
    total_rows = next(
        (s["rows"] for s in reversed(stages) if s["rows"]), None
    )
    return {"stages": stages, "docs": total_rows, "raw": stats_text}
