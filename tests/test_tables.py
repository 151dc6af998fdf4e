"""Table-loader contract: `load_table("events")` must normalize every
shipped timestamp vintage to a UTC-anchored instant WITHOUT mutating the
caller's session timezone, and must fail loudly on unknown vintages
(ADVICE items, sources/tables.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_events_load_restores_session_timezone(spark):
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, "events", SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        # and the frame is still usable after the caller's tz survives
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_events_instant_is_session_tz_independent(spark):
    """The epoch value of ts (the thing every window/asof/interval op keys
    on) must not depend on the session timezone at LOAD time or at
    EXECUTION time — the conversion is lazy, so both matter."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_micros = [
            r[0]
            for r in load_table(spark, "events", SF_DIR)
            .select(F.unix_micros("ts"))
            .orderBy("event_id")
            .limit(20)
            .collect()
        ]

        # load under one tz, execute under ANOTHER: the lazy plan must
        # still produce the same instants
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        df = load_table(spark, "events", SF_DIR).select(F.unix_micros("ts")).orderBy("event_id").limit(20)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_micros = [r[0] for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert ny_micros == utc_micros


def test_events_wall_clock_matches_duckdb_naive(spark):
    """With the session pinned UTC (the harness contract), the rendered
    wall clock equals DuckDB's naive read of the same parquet."""
    import duckdb

    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        got = [
            r[0].strftime("%Y-%m-%d %H:%M:%S.%f")
            for r in load_table(spark, "events", SF_DIR).select("ts").orderBy("event_id").limit(10).collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    path = os.path.join(SF_DIR, "events.parquet")
    want = [
        ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        for (ts,) in duckdb.sql(
            f"SELECT ts FROM read_parquet('{path}') ORDER BY event_id LIMIT 10"
        ).fetchall()
    ]
    assert got == want


def test_unknown_ts_vintage_fails_at_load(spark, tmp_path):
    """A future vintage (e.g. ts as string) must raise at load, not NULL
    out downstream."""
    bad_dir = tmp_path / "sfbad"
    bad_dir.mkdir()
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "query", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(bad_dir / "events.parquet"))
    with pytest.raises(TypeError, match="vintage"):
        load_table(spark, "events", str(bad_dir))
