"""Sessionization — gap-based event sessions (batch + streaming forms).

The reference has no stream processing (SURVEY §2.9); this is a
Spark-native extension for the events/training-telemetry side of the
pipeline. Batch form is the classic lag→gap→cumsum window chain, fully
oracle-expressible; the streaming twin is ``session_window`` /
``applyInPandasWithState`` over the same schema.

Scale: one shuffle (partition by user), sorted within partitions; the
window functions pipeline in a single pass — no iterative logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "streaming_session_counts"]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a session_id per (user, burst-of-activity).

    A new session starts when the gap from the previous event exceeds
    ``gap_seconds``. session_id is the per-user session ordinal (0-based).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w) - 1
    ).drop("_new")


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: event count + duration seconds."""
    s = sessionize(events, gap_seconds, user_col, ts_col, order_tiebreak)
    # duration stays in exact integer microseconds — callers derive seconds
    # with deterministic integer truncation (float rounding of µs/1e6 sits
    # on half-boundaries whenever µs ends in ...50)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias("duration_us"),
    )


def streaming_session_counts(
    stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin: ``session_window`` + watermark over an event stream.

    Gap semantics match the batch ``sessionize`` (a session closes after
    ``gap_seconds`` of inactivity), so on a finite backlog the per-session
    event counts agree with the batch form — asserted in tests.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), f"{gap_seconds} seconds"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
