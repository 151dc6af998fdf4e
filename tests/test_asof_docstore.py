"""As-of join tie semantics + docstore mutation ops."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators import docstore
from morphik_core_spark.operators.asof import asof_backward, asof_nearest, at_time_padding


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        (1, ts("2024-01-01T00:00:10"), "a"),
        (1, ts("2024-01-01T00:00:20"), "b"),
        (1, ts("2024-01-01T00:00:30"), "c"),
        (2, ts("2024-01-01T00:00:05"), "z"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, content string").cache()


def test_nearest_picks_closest(series, spark):
    probes = spark.createDataFrame(
        [(100, 1, ts("2024-01-01T00:00:12")), (101, 1, ts("2024-01-01T00:00:29"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r.event_id: r.matched_ts for r in asof_nearest(probes, series, "user_id").collect()}
    assert got[100] == ts("2024-01-01T00:00:10")
    assert got[101] == ts("2024-01-01T00:00:30")


def test_nearest_tie_prefers_earlier(series, spark):
    probes = spark.createDataFrame(
        [(100, 1, ts("2024-01-01T00:00:15"))], "event_id long, user_id long, ts timestamp"
    )
    got = asof_nearest(probes, series, "user_id").first()
    assert got.matched_ts == ts("2024-01-01T00:00:10")  # reference: tie → earlier


def test_nearest_out_of_range_and_missing_key(series, spark):
    probes = spark.createDataFrame(
        [(1, 1, ts("2023-12-31T00:00:00")), (2, 1, ts("2025-01-01T00:00:00")), (3, 99, ts("2024-01-01T00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r.event_id: r.matched_ts for r in asof_nearest(probes, series, "user_id").collect()}
    assert got[1] == ts("2024-01-01T00:00:10")  # clamps to first
    assert got[2] == ts("2024-01-01T00:00:30")  # clamps to last
    assert got[3] is None  # no series for key


def test_backward_asof(series, spark):
    probes = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T00:00:25")), (2, 1, ts("2024-01-01T00:00:05"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r.event_id: r.matched_ts for r in asof_backward(probes, series, "user_id").collect()}
    assert got[1] == ts("2024-01-01T00:00:20")
    assert got[2] is None  # nothing at or before


def test_at_time_padding_window(series, spark):
    probes = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T00:00:20"))], "event_id long, user_id long, ts timestamp"
    )
    got = sorted(r.matched_ts for r in at_time_padding(probes, series, "user_id", 10).collect())
    assert got == [ts("2024-01-01T00:00:10"), ts("2024-01-01T00:00:20"), ts("2024-01-01T00:00:30")]


def test_upsert_replaces_on_key(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "C")], "id long, v string")
    got = {r.id: r.v for r in docstore.upsert(base, updates, ["id"]).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_move_folder_rewrites_subtree(spark):
    docs = spark.createDataFrame(
        [(1, "/a/b"), (2, "/a/b/c"), (3, "/a/bc"), (4, "/other")], "id long, folder_path string"
    )
    got = {r.id: r.folder_path for r in docstore.move_folder(docs, "/a/b", "/x/y").collect()}
    assert got == {1: "/x/y", 2: "/x/y/c", 3: "/a/bc", 4: "/other"}  # /a/bc NOT a descendant


def test_batch_get_composite_keys(spark):
    t = spark.createDataFrame([(1, 1, "x"), (1, 2, "y"), (2, 1, "z")], "a long, b int, v string")
    got = {(r.a, r.b) for r in docstore.batch_get(t, [(1, 2), (2, 1), (9, 9)], ["a", "b"]).collect()}
    assert got == {(1, 2), (2, 1)}


def test_asof_directional_window_form_equals_join_form(spark):
    """The union-tag-window implementation must reproduce the join+groupBy
    semantics row-for-row — including series rows exactly AT a probe's
    timestamp (<= / >= tie inclusion) and keys with no match (NULL)."""
    from pyspark.sql import functions as F

    from morphik_core_spark.operators import asof

    probes = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 12:00:00"),
         (3, "u2", "2024-01-01 09:00:00"),   # before any series row
         (4, "u2", "2024-01-01 11:00:00"),
         (5, "u3", "2024-01-01 11:00:00")],  # key with no series at all
        "event_id int, user_id string, ts string",
    ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"))
    series = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00"),  # exact tie with probe 1
         ("u1", "2024-01-01 11:30:00"),
         ("u2", "2024-01-01 10:00:00"),
         ("u2", "2024-01-01 11:00:00")],  # exact tie with probe 4
        "user_id string, ts string",
    ).select("user_id", F.to_timestamp("ts").alias("ts"))

    def join_form(direction):
        p, s = probes.alias("p"), series.alias("s")
        cmp = F.col("s.ts") <= F.col("p.ts") if direction == "backward" else F.col("s.ts") >= F.col("p.ts")
        agg = F.max("s.ts") if direction == "backward" else F.min("s.ts")
        m = (p.join(s, (F.col("p.user_id") == F.col("s.user_id")) & cmp)
             .groupBy(F.col("p.event_id").alias("event_id")).agg(agg.alias("matched_ts")))
        return probes.join(m, "event_id", "left")

    for direction, fn in (("backward", asof.asof_backward), ("forward", asof.asof_forward)):
        got = sorted(map(tuple, fn(probes, series, key="user_id")
                         .select("event_id", "matched_ts").collect()))
        want = sorted(map(tuple, join_form(direction)
                          .select("event_id", "matched_ts").collect()))
        assert got == want, direction
    # ties included: probe 1 backward matches its own timestamp
    back = {r["event_id"]: r["matched_ts"] for r in
            asof.asof_backward(probes, series, key="user_id").collect()}
    assert str(back[1]) == "2024-01-01 10:00:00"
    assert back[3] is None and back[5] is None


def test_pit_join_boundaries_and_open_interval(spark):
    """PIT semantics: ts == valid_from joins the NEW version, ts ==
    valid_to is excluded (half-open), the open current version catches
    everything after, and probes before history surface as NULL on a
    left join."""
    import datetime

    from morphik_core_spark.operators.asof import pit_join

    t = lambda s: datetime.datetime(2026, 1, s)
    dim = spark.createDataFrame(
        [
            ("u1", "v1", t(1), t(10)),
            ("u1", "v2", t(10), t(20)),
            ("u1", "v3", t(20), None),
        ],
        "user string, state string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            ("u1", t(5)),    # inside v1
            ("u1", t(10)),   # boundary -> v2, not v1
            ("u1", t(25)),   # open interval -> v3
            ("u1", datetime.datetime(2025, 12, 1)),  # before history -> NULL
            ("u2", t(5)),    # unknown key -> NULL
        ],
        "user string, ts timestamp",
    )
    out = pit_join(facts, dim, "user", "ts")
    got = {(r["user"], r["ts"]): r["state"] for r in out.collect()}
    assert got[("u1", t(5))] == "v1"
    assert got[("u1", t(10))] == "v2"
    assert got[("u1", t(25))] == "v3"
    assert got[("u1", datetime.datetime(2025, 12, 1))] is None
    assert got[("u2", t(5))] is None
    assert out.count() == 5  # exactly one row per probe — intervals don't overlap


def test_pit_join_plan_is_equi_join(spark):
    """Catalyst must extract the key equality — the plan is a hash/merge
    equi-join with the interval predicate as condition, never a
    cartesian or a broadcast nested loop over big sides."""
    import datetime

    from morphik_core_spark.operators.asof import pit_join

    t0 = datetime.datetime(2026, 1, 1)
    dim = spark.createDataFrame(
        [(f"u{i}", "s", t0, None) for i in range(200)],
        "user string, state string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [(f"u{i % 200}", t0) for i in range(1000)], "user string, ts timestamp"
    )
    plan = pit_join(facts, dim, "user", "ts")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
