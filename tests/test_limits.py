"""Usage/tier accounting: counter semantics, page estimation, free-tier-only
enforcement (reference limits_utils.py / user_service.py behavior)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from morphik_core_spark.operators import limits


def test_estimate_pages_reference_boundaries(spark):
    # 4 chars/token * 630 tokens/page = 2520 chars/page; min 1 page always
    df = spark.createDataFrame([(0,), (1,), (2520,), (2521,), (5040,), (-5,)], "chars long")
    got = [r.p for r in df.select(limits.estimate_pages(F.col("chars")).alias("p")).collect()]
    assert got == [1, 1, 1, 2, 2, 1]


def _mk_events(spark):
    rows = [
        # user 0 (free): 2 queries in the as-of hour, 1 earlier in the month
        (0, datetime(2024, 1, 30, 23, 5), "query", 0, 0),
        (0, datetime(2024, 1, 30, 23, 50), "query", 0, 0),
        (0, datetime(2024, 1, 2, 1, 0), "query", 0, 0),
        # user 0: two ingests (1 page + 2 pages), one stored file of 100 bytes
        (0, datetime(2024, 1, 3, 0, 0), "ingest", 100, 0),
        (0, datetime(2024, 1, 4, 0, 0), "ingest", 2521, 0),
        (0, datetime(2024, 1, 5, 0, 0), "storage_file", 0, 100),
        # user 1 (pro): wildly over every free limit
        *[(1, datetime(2024, 1, 30, 23, i % 60), "query", 0, 0) for i in range(100)],
        (1, datetime(2024, 1, 6, 0, 0), "ingest", 2520 * 1000, 0),
        # user 4 (free): over hourly query limit (31 > 30)
        *[(4, datetime(2024, 1, 30, 23, i % 60), "query", 0, 0) for i in range(31)],
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, chars long, bytes long"
    )


def test_usage_counters_and_flags(spark):
    ev = _mk_events(spark)
    counters = limits.usage_counters(ev, as_of="2024-01-30 23:00:00")
    tiered = counters.withColumn(
        "tier", F.when(F.col("user_id") % 4 == 0, "free").otherwise("pro")
    )
    out = {r.user_id: r for r in limits.check_limits(tiered, limits.tier_limits_df(ev.sparkSession)).collect()}

    u0 = out[0]
    assert u0.hourly_query_count == 2
    assert u0.monthly_query_count == 3
    assert u0.ingest_pages == 3  # 1 + 2
    assert u0.storage_file_count == 1 and u0.storage_size_bytes == 100
    assert not (u0.over_query or u0.over_ingest or u0.over_storage_files or u0.over_storage_size)

    # paid tier: metered, never blocked (reference: limits only on free)
    u1 = out[1]
    assert u1.hourly_query_count == 100 and u1.ingest_pages == 1000
    assert not (u1.over_query or u1.over_ingest)

    # free tier over the hourly limit
    u4 = out[4]
    assert u4.hourly_query_count == 31 and u4.over_query


def test_counters_users_with_no_matching_events_still_zero(spark):
    ev = spark.createDataFrame(
        [(7, datetime(2024, 1, 1, 0, 0), "error", 0, 0)],
        "user_id long, ts timestamp, event_type string, chars long, bytes long",
    )
    row = limits.usage_counters(ev, as_of="2024-01-30 23:00:00").collect()[0]
    assert (
        row.hourly_query_count,
        row.monthly_query_count,
        row.ingest_pages,
        row.storage_file_count,
        row.storage_size_bytes,
    ) == (0, 0, 0, 0, 0)
