"""Table statistics (ANALYZE analog): row counts, per-column min/max,
null counts, and approximate distinct counts, persisted as a JSON
manifest next to the table.

This closes the planning loop SCALE.md promises: the broadcast gates
(`retrieval.scoped_chunks`'s limit-probe, bench-time join choices) can
consult persisted stats instead of probing — on a cluster the probe
costs a scan-task launch per query, while stats are computed once per
snapshot (e.g. in the same job as `maintenance.versioned_write` /
`compact`) and read for free.

The ndv estimate uses Spark's built-in HLL (`approx_count_distinct`) —
engine-internal planning data needs no cross-engine oracle; the
oracle-checkable HLL lives in `operators/sketches`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compute_table_stats", "write_stats", "read_stats", "should_broadcast"]

_STATS_FILE = "_stats.json"


def compute_table_stats(df: DataFrame, cols: list[str] | None = None) -> dict:
    """One aggregation pass → {row_count, columns: {col: {min, max,
    null_count, approx_ndv}}}. min/max are stringified (JSON-safe across
    types); numeric consumers parse back."""
    cols = cols or [c for c, t in df.dtypes if not t.startswith(("array", "map", "struct", "binary"))]
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            F.approx_count_distinct(c).alias(f"_ndv_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    return {
        "row_count": row["_rows"],
        "columns": {
            c: {
                "min": row[f"_min_{c}"],
                "max": row[f"_max_{c}"],
                "null_count": row[f"_nulls_{c}"],
                "approx_ndv": row[f"_ndv_{c}"],
            }
            for c in cols
        },
    }


def write_stats(table_path: str, stats: dict) -> None:
    p = os.path.join(table_path, _STATS_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, p)


def read_stats(table_path: str) -> dict | None:
    p = os.path.join(table_path, _STATS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def should_broadcast(stats: dict | None, max_rows: int) -> bool | None:
    """Gate decision from persisted stats; None = unknown (caller falls
    back to its probe)."""
    if not stats or "row_count" not in stats:
        return None
    return stats["row_count"] <= max_rows
