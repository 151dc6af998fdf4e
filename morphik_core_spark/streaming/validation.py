"""Streaming data-quality gate: every ingest micro-batch profiles
itself through the one-pass validation suite and appends its metric +
check rows to a metrics table, tagged by epoch — the "stop the pipeline
when completeness drops" hook, and a per-batch quality time series for
free (feed two epochs of it to `analytics.population_stability` and the
drift monitor composes on top).

Replay safety is the `_epoch`-partition + dynamic-overwrite trick from
`streaming/ingestion`: foreachBatch is at-least-once, so a replayed
epoch REWRITES its own partition instead of appending duplicate metric
rows. Per-epoch cost is one aggregation pass over the batch (the
validation suite's contract) + one tiny write.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphik_core_spark.operators.validation import validation_suite

__all__ = ["run_validation_stream", "read_validation_metrics", "failed_checks"]


def run_validation_stream(
    events_stream: DataFrame,
    metrics_path: str,
    checkpoint: str,
    suite_kwargs: dict[str, Any],
    on_epoch: Callable[[int, DataFrame], None] | None = None,
):
    """Profile every micro-batch with ``validation_suite(**suite_kwargs)``
    and land the long-format rows under ``metrics_path`` partitioned by
    ``_epoch``. ``on_epoch`` (optional) receives (epoch_id, metrics_df)
    AFTER the write — the alerting hook; exceptions it raises fail the
    epoch, which is the point (a failing gate should stop the stream).
    Returns the started query (AvailableNow + checkpoint semantics as
    everywhere)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        metrics = validation_suite(batch_df, **suite_kwargs).withColumn(
            "_epoch", F.lit(int(epoch_id))
        )
        (
            metrics.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(metrics_path)
        )
        if on_epoch is not None:
            on_epoch(int(epoch_id), metrics)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_validation_metrics(spark, metrics_path: str) -> DataFrame:
    """The accumulated per-epoch metric table (entity, metric, value,
    _epoch)."""
    return spark.read.parquet(metrics_path)


def failed_checks(metrics: DataFrame) -> DataFrame:
    """Check rows that failed, any epoch — the alert feed."""
    return metrics.filter(
        F.col("metric").startswith("check:") & (F.col("value") == 0.0)
    )
