"""Streaming join-view maintenance: a unified two-sided CDC bus folded
into the versioned view + B snapshot, equivalence with a fresh join of
the CDC-applied tables, restart resume, and crash-replay no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.plans.maintenance import (
    list_versions,
    read_version,
    versioned_write,
)
from morphik_core_spark.streaming.join_view import (
    apply_join_view_epoch,
    run_join_view_stream,
)

# the unified bus: side='A' rows carry (pk, fk, payload); side='B' rows
# carry (fk, b_val); unused columns ride NULL
BUS_SCHEMA = "side string, op string, pk long, fk long, payload string, b_val string"
A_COLS = ["pk", "fk", "payload"]
B_COLS = ["b_val"]


def _seed(spark, view_path, b_path, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "pk long, fk long, payload string")
    b = spark.createDataFrame(b_rows, "fk long, b_val string")
    view = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    versioned_write(view, view_path, op="seed")
    versioned_write(b, b_path, op="seed")
    return a, b


def _write_bus(spark, feed, rows):
    spark.createDataFrame(rows, BUS_SCHEMA).coalesce(1).write.mode("append").parquet(feed)


def _rows(spark, path):
    return sorted(map(tuple, read_version(spark, path).collect()))


def test_join_view_stream_equivalence_and_restart(spark, tmp_path):
    view_path = str(tmp_path / "view")
    b_path = str(tmp_path / "bsnap")
    chk = str(tmp_path / "chk")
    feed = str(tmp_path / "feed")
    _seed(
        spark,
        view_path,
        b_path,
        [(1, 10, "a1"), (2, 10, "a2"), (3, 20, "a3"), (4, 30, "a4")],
        [(10, "b-ten"), (20, "b-twenty"), (30, "b-thirty")],
    )

    # epoch 1: A-side insert + update; B-side update fanning to pk 1, 2
    _write_bus(
        spark,
        feed,
        [
            ("A", "U", 3, 10, "a3-v2", None),
            ("A", "I", 5, 20, "a5", None),
            ("B", "U", None, 10, None, "b-ten-v2"),
        ],
    )
    # epoch 2: A delete; B delete + insert matched by nothing yet
    _write_bus(
        spark,
        feed,
        [
            ("A", "D", 4, None, None, None),
            ("B", "D", None, 20, None, None),
            ("B", "I", None, 40, None, "b-forty"),
        ],
    )

    def run():
        stream = (
            spark.readStream.schema(BUS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_join_view_stream(
            stream, view_path, b_path, "pk", "fk", A_COLS, B_COLS, chk
        )
        q.awaitTermination(120)

    run()
    # equivalence: the maintained view == fresh join of the CDC-applied
    # tables after both epochs
    a2 = spark.createDataFrame(
        [(1, 10, "a1"), (2, 10, "a2"), (3, 10, "a3-v2"), (5, 20, "a5")],
        "pk long, fk long, payload string",
    )
    b2 = spark.createDataFrame(
        [(10, "b-ten-v2"), (30, "b-thirty"), (40, "b-forty")],
        "fk long, b_val string",
    )
    fresh = a2.join(b2, "fk").select("fk", "pk", "payload", "b_val")
    assert _rows(spark, view_path) == sorted(map(tuple, fresh.collect()))
    assert _rows(spark, b_path) == sorted(map(tuple, b2.collect()))
    n_view = len(list_versions(view_path))
    n_b = len(list_versions(b_path))
    assert n_view >= 3 and n_b >= 3  # seed + 2 epochs each

    # restart with nothing new: no new versions on either table
    run()
    assert len(list_versions(view_path)) == n_view
    assert len(list_versions(b_path)) == n_b

    # a new bus file after restart continues from the checkpoint, and
    # pins the documented self-maintainability boundary: fk 20 was
    # DELETED in epoch 2 (evicting a5's row from the inner-join view),
    # so a later re-insert re-attaches NOTHING from the view alone —
    # the B snapshot gains the key, the view stays unchanged until an
    # A-side upsert re-feeds the fact
    _write_bus(spark, feed, [("B", "I", None, 20, None, "b-twenty-v2")])
    run()
    assert (20, "b-twenty-v2") in _rows(spark, b_path)
    assert all(r[0] != 20 for r in _rows(spark, view_path))
    _write_bus(spark, feed, [("A", "U", 5, 20, "a5", None)])
    run()
    assert (20, 5, "a5", "b-twenty-v2") in _rows(spark, view_path)


def test_join_view_epoch_replay_is_noop(spark, tmp_path):
    view_path = str(tmp_path / "view2")
    b_path = str(tmp_path / "bsnap2")
    _seed(spark, view_path, b_path, [(1, 10, "a1")], [(10, "b-v1")])
    batch = spark.createDataFrame(
        [("B", "U", None, 10, None, "b-v2")], BUS_SCHEMA
    )
    assert apply_join_view_epoch(
        batch, 7, view_path, b_path, "pk", "fk", A_COLS, B_COLS
    )
    v_view = len(list_versions(view_path))
    v_b = len(list_versions(b_path))
    # replay of the SAME epoch: no-op on both tables
    assert not apply_join_view_epoch(
        batch, 7, view_path, b_path, "pk", "fk", A_COLS, B_COLS
    )
    assert len(list_versions(view_path)) == v_view
    assert len(list_versions(b_path)) == v_b
    assert _rows(spark, view_path) == [(10, 1, "a1", "b-v2")]


def test_join_view_epoch_half_applied_crash_recovers(spark, tmp_path):
    """A crash between the view write and the snapshot write replays the
    epoch; the tag check re-commits ONLY the missing snapshot, so the
    tables end in lockstep."""
    from morphik_core_spark.operators.incremental import incremental_join_apply_both

    view_path = str(tmp_path / "view3")
    b_path = str(tmp_path / "bsnap3")
    _seed(spark, view_path, b_path, [(1, 10, "a1")], [(10, "b-v1")])
    batch = spark.createDataFrame(
        [("B", "U", None, 10, None, "b-v2")], BUS_SCHEMA
    )
    # simulate the half-applied state: commit the view's epoch tag only
    delta_b = batch.filter(F.col("side") == "B").select("fk", "b_val", "op")
    view = read_version(spark, view_path)
    b = read_version(spark, b_path)
    delta_a = batch.filter(F.col("side") == "A").select("pk", "fk", "payload", "op")
    maintained = incremental_join_apply_both(
        view, delta_a, b, delta_b, "pk", "fk", b_cols=["b_val"]
    )
    versioned_write(maintained, view_path, op="joinview:3")
    # replayed epoch: view already tagged -> only the snapshot commits
    assert apply_join_view_epoch(
        batch, 3, view_path, b_path, "pk", "fk", A_COLS, B_COLS
    )
    assert _rows(spark, b_path) == [(10, "b-v2")]
    assert _rows(spark, view_path) == [(10, 1, "a1", "b-v2")]


def test_join_view_stream_with_a_snapshot_resurrects(spark, tmp_path):
    """With an A snapshot maintained beside the view (a_path), the
    delete-then-reinsert scenario that the base test pins as lost now
    RESURRECTS the surviving fact — and the A snapshot itself absorbs
    A-side ops under its own epoch tags."""
    view_path = str(tmp_path / "view")
    b_path = str(tmp_path / "bsnap")
    a_path = str(tmp_path / "asnap")
    chk = str(tmp_path / "chk")
    feed = str(tmp_path / "feed")
    a, b = _seed(
        spark,
        view_path,
        b_path,
        [(1, 10, "a1"), (5, 20, "a5")],
        [(10, "b-ten"), (20, "b-twenty")],
    )
    versioned_write(a, a_path, op="seed")

    # epoch 1: delete dim 20 (evicts a5's row); epoch 2: re-insert it
    _write_bus(spark, feed, [("B", "D", None, 20, None, None)])
    _write_bus(spark, feed, [("B", "I", None, 20, None, "b-twenty-v2")])

    def run():
        stream = (
            spark.readStream.schema(BUS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_join_view_stream(
            stream, view_path, b_path, "pk", "fk", A_COLS, B_COLS, chk,
            a_path=a_path,
        )
        q.awaitTermination(120)

    run()
    got = _rows(spark, view_path)
    # the A snapshot let revival re-attach a5 to the re-inserted dim row
    assert (20, 5, "a5", "b-twenty-v2") in got
    assert (10, 1, "a1", "b-ten") in got
    # A-side ops maintain the snapshot: delete pk 1
    _write_bus(spark, feed, [("A", "D", 1, None, None, None)])
    run()
    assert _rows(spark, a_path) == [(5, 20, "a5")]
    assert all(r[1] != 1 for r in _rows(spark, view_path))
