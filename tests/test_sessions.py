"""Sessionization: batch semantics + streaming session_window equivalence."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.sessions import (
    session_stats,
    sessionize,
    streaming_session_counts,
)

T0 = datetime(2024, 1, 1)


def _ev(eid, uid, offset_s):
    return (eid, uid, T0 + timedelta(seconds=offset_s))


EVENTS = [
    _ev(1, 1, 0),
    _ev(2, 1, 100),      # same session (gap 100)
    _ev(3, 1, 2000),     # new session   (gap 1900 > 1800)
    _ev(4, 1, 2100),
    _ev(5, 2, 0),        # other user: one session
    _ev(6, 2, 1800),     # exactly at gap → same session (strict >)
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, "event_id long, user_id long, ts timestamp").cache()


def test_sessionize_assignment(events):
    got = {r.event_id: r.session_id for r in sessionize(events, 1800).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0}


def test_session_stats(events):
    rows = {(r.user_id, r.session_id): r for r in session_stats(events, 1800).collect()}
    assert rows[(1, 0)].n_events == 2 and rows[(1, 0)].duration_us == 100_000_000
    assert rows[(1, 1)].n_events == 2
    assert rows[(2, 0)].n_events == 2 and rows[(2, 0)].duration_us == 1800_000_000


def test_streaming_matches_batch(spark, events, tmp_path):
    """session_window over a finite stream produces the same per-session
    event counts as the batch lag/cumsum form."""
    src = str(tmp_path / "events_in")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(src)
    out = streaming_session_counts(stream, 1800)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = session_stats(events, 1800)
    starts = sessionize(events, 1800).groupBy("user_id", "session_id").agg(F.min("ts").alias("start"))
    batch_rows = {
        (r.user_id, r.start): r.n_events
        for r in batch.join(starts, ["user_id", "session_id"]).collect()
    }
    assert streamed == batch_rows


def test_time_bucket_gapfill_locf(spark):
    from datetime import datetime

    from morphik_core_spark.operators.sessions import time_bucket_gapfill

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0),
        (1, datetime(2024, 1, 1, 0, 45), 5.0),   # same bucket as above
        (1, datetime(2024, 1, 1, 3, 10), 2.0),   # bucket +3 (two gap buckets)
        (2, datetime(2024, 1, 1, 5, 0), 7.0),    # single-bucket key
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = time_bucket_gapfill(df, bucket_secs=3600).orderBy("user_id", "bucket_ts").collect()

    u1 = [r for r in out if r.user_id == 1]
    assert len(u1) == 4  # buckets 0,1,2,3 — gaps materialized
    assert [r.n_events for r in u1] == [2, 0, 0, 1]
    assert u1[0].v_sum == 15.0 and u1[1].v_sum is None
    assert [r.v_locf for r in u1] == [15.0, 15.0, 15.0, 2.0]  # carried forward
    assert u1[0].bucket_ts == datetime(2024, 1, 1, 0, 0)
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].v_locf == 7.0


def test_change_intervals_scd2_semantics(spark):
    import datetime

    from morphik_core_spark.operators.sessions import change_intervals

    t = lambda s: datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)
    rows = [
        # user 1: A A B A — four events, three islands; final island open
        (1, t(0), 1, "A"), (1, t(10), 2, "A"), (1, t(20), 3, "B"), (1, t(30), 4, "A"),
        # user 2: single state, multi-event open island (regression: its
        # interior leads must NOT leak into valid_to)
        (2, t(0), 5, "X"), (2, t(10), 6, "X"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    out = change_intervals(df, "user_id", "ts", "event_id", "event_type").collect()
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["valid_from"])
    assert [(r["event_type"], r["n_events"], r["is_current"]) for r in u1] == [
        ("A", 2, False), ("B", 1, False), ("A", 1, True)
    ]
    assert u1[0]["valid_to"] == t(20) and u1[1]["valid_to"] == t(30)
    assert u1[2]["valid_to"] is None
    [u2] = [r for r in out if r["user_id"] == 2]
    assert u2["n_events"] == 2 and u2["is_current"] and u2["valid_to"] is None
