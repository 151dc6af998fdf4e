"""Streaming validation gate: per-epoch metric rows, failing checks
surface, replay idempotency via epoch-partition overwrite, and the
alert hook firing order."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.streaming.validation import (
    failed_checks,
    read_validation_metrics,
    run_validation_stream,
)

SCHEMA = "id bigint, text string"
SPEC = dict(
    completeness_cols=["id", "text"],
    unique_cols=["id"],
    length_cols=["text"],
    min_completeness={"text": 0.9},
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, feed, metrics, chk, on_epoch=None):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(feed)
    q = run_validation_stream(stream, metrics, chk, SPEC, on_epoch=on_epoch)
    assert q.awaitTermination(120)


def test_per_epoch_metrics_and_alerts(spark, tmp_path):
    feed, metrics, chk = (str(tmp_path / d) for d in ("f", "m", "c"))
    # epoch 0: healthy; epoch 1: 2 of 3 texts NULL -> completeness gate fails
    _write(spark, feed, [(1, "aa"), (2, "bb")])
    _write(spark, feed, [(3, None), (4, None), (5, "cc")])

    seen = []
    _run(spark, feed, metrics, chk, on_epoch=lambda e, df: seen.append(e))
    assert sorted(seen) == [0, 1]

    m = read_validation_metrics(spark, metrics)
    by = {(r._epoch, r.entity, r.metric): r.value for r in m.collect()}
    assert by[(0, "_table", "row_count")] == 2.0
    assert by[(0, "text", "check:complete")] == 1.0
    assert by[(1, "text", "completeness")] == round(1 / 3, 6)
    assert by[(1, "text", "check:complete")] == 0.0

    bad = failed_checks(m).collect()
    assert {(r._epoch, r.entity) for r in bad} == {(1, "text")}

    # restart with nothing new: no new epochs, row count stable
    n = m.count()
    _run(spark, feed, metrics, chk)
    assert read_validation_metrics(spark, metrics).count() == n


def test_failing_hook_stops_epoch(spark, tmp_path):
    feed, metrics, chk = (str(tmp_path / d) for d in ("f2", "m2", "c2"))
    _write(spark, feed, [(1, None)])

    def gate(epoch, df):
        if failed_checks(df).take(1):
            raise RuntimeError("quality gate failed")

    stream = spark.readStream.schema(SCHEMA).parquet(feed)
    q = run_validation_stream(stream, metrics, chk, SPEC, on_epoch=gate)
    try:
        q.awaitTermination(120)
        stopped_with_error = q.exception() is not None
    except Exception:
        stopped_with_error = True
    assert stopped_with_error
