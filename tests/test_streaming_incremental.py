"""Streaming rollup maintenance: file-source epochs folded into the
versioned state table, equivalence with one batch aggregate, restart
resume, and crash-replay no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.operators.incremental import agg_state, finalize_agg
from morphik_core_spark.plans.maintenance import (
    list_versions,
    read_version,
    versioned_write,
)
from morphik_core_spark.streaming.incremental import (
    apply_rollup_epoch,
    run_rollup_stream,
)

EVENT_SCHEMA = "k string, value double"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _seed(spark, table):
    empty = spark.createDataFrame([], EVENT_SCHEMA)
    versioned_write(agg_state(empty, ["k"], {"v": "value"}), table, op="seed")


def _state(spark, table):
    return {
        r.k: (r.n, float(r.sum_v)) for r in read_version(spark, table).collect()
    }


def test_rollup_stream_equivalence_and_restart(spark, tmp_path):
    table = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    feed = str(tmp_path / "feed")
    _seed(spark, table)

    _write_events(spark, feed, [("a", 1.0), ("a", 2.0), ("b", 10.0)])
    _write_events(spark, feed, [("a", 4.0), ("c", 0.5)])

    def run():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_rollup_stream(stream, table, ["k"], {"v": "value"}, chk)
        q.awaitTermination(120)

    run()
    got = _state(spark, table)
    # equivalence: folded state == one batch aggregate over all rows
    full = agg_state(spark.read.parquet(feed), ["k"], {"v": "value"})
    want = {r.k: (r.n, float(r.sum_v)) for r in full.collect()}
    assert got == want == {"a": (3, 7.0), "b": (1, 10.0), "c": (1, 0.5)}
    n_versions = len(list_versions(table))
    assert n_versions >= 3  # seed + >=2 epochs

    # restart with nothing new: no new versions
    run()
    assert len(list_versions(table)) == n_versions

    # new file after restart continues from the checkpoint
    _write_events(spark, feed, [("b", -10.0)])
    run()
    assert _state(spark, table)["b"] == (2, 0.0)

    # time travel: pre-merge states stay readable
    assert _state.__call__(spark, table) != {}
    assert read_version(spark, table, 0).count() == 0  # empty seed


def test_rollup_epoch_replay_is_noop(spark, tmp_path):
    table = str(tmp_path / "state2")
    _seed(spark, table)
    batch = spark.createDataFrame([("a", 5.0)], EVENT_SCHEMA)
    assert apply_rollup_epoch(batch, 7, table, ["k"], {"v": "value"})
    v = len(list_versions(table))
    # crash replay of the SAME epoch: no merge, no version
    assert not apply_rollup_epoch(batch, 7, table, ["k"], {"v": "value"})
    assert len(list_versions(table)) == v
    assert _state(spark, table)["a"] == (1, 5.0)
    # empty batch: no version either
    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert not apply_rollup_epoch(empty, 8, table, ["k"], {"v": "value"})
    assert len(list_versions(table)) == v


def test_finalized_view_reads_from_state(spark, tmp_path):
    table = str(tmp_path / "state3")
    _seed(spark, table)
    batch = spark.createDataFrame([("a", 1.0), ("a", 2.0)], EVENT_SCHEMA)
    apply_rollup_epoch(batch, 1, table, ["k"], {"v": "value"})
    out = finalize_agg(read_version(spark, table), means=["v"]).collect()[0]
    assert out.mean_v == 1.5
