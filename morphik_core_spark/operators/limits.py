"""Usage/tier accounting — the reference's limits subsystem re-expressed
as a log rollup.

Reference semantics (/root/reference/core/limits_utils.py:47-221,
core/services/user_service.py:56-131, core/models/tiers.py:15-63):

- usage counters per account: hourly_query_count / monthly_query_count
  (reset per hour/month), lifetime ingest pages, storage file count and
  byte size.
- pages are estimated from characters: 4 chars per token, 630 tokens per
  page, minimum 1 page per ingest (limits_utils.estimate_pages_by_chars).
- limits apply to the FREE tier only; paid tiers are metered but never
  blocked.

The reference mutates counters row-by-row in Postgres on every request
(user_limits table, update_usage). The Spark-first restatement derives
the same counters from the immutable usage-event log in ONE conditional
aggregation pass — a single shuffle on the account key with map-side
combine, so 100 TB of events rolls up without any per-request hot row.
Counter "resets" become calendar-bucket predicates against ``as_of``
(the reference's reset-if-stale logic is exactly "count only events in
the current hour/month bucket").

Tier limits are a 4-row dimension — always broadcast. NULL limit =
unlimited (paid tiers), so over-limit flags are false for them by
NULL-comparison semantics, mirroring "only apply limits to free tier".

All column math stays integer-exact (floor/ceil then cast) so the DuckDB
oracle reproduces values bit-for-bit — no float-sum order dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "CHARS_PER_TOKEN",
    "TOKENS_PER_PAGE",
    "TIER_LIMITS",
    "estimate_pages",
    "tier_limits_df",
    "usage_counters",
    "check_limits",
]

# reference limits_utils.py:52-55
CHARS_PER_TOKEN = 4
TOKENS_PER_PAGE = 630

# reference core/models/tiers.py TIER_LIMITS — free tier numbers; paid
# tiers have no enforced limits (None = unlimited).
TIER_LIMITS: dict[str, dict[str, int | float | None]] = {
    "free": {
        "hourly_query_limit": 30,
        "monthly_query_limit": 50,
        "ingest_limit": 200,
        "storage_file_limit": 30,
        "storage_size_limit_bytes": int(0.25 * 1024**3),
    },
    "pro": {
        "hourly_query_limit": None,
        "monthly_query_limit": None,
        "ingest_limit": None,
        "storage_file_limit": None,
        "storage_size_limit_bytes": None,
    },
    "teams": {
        "hourly_query_limit": None,
        "monthly_query_limit": None,
        "ingest_limit": None,
        "storage_file_limit": None,
        "storage_size_limit_bytes": None,
    },
    "self_hosted": {
        "hourly_query_limit": None,
        "monthly_query_limit": None,
        "ingest_limit": None,
        "storage_file_limit": None,
        "storage_size_limit_bytes": None,
    },
}


def estimate_pages(chars: Column) -> Column:
    """Characters → billed pages (limits_utils.estimate_pages_by_chars):
    ceil(chars / (4 * 630)), never less than 1 — small ingests bill one
    full page."""
    pages = F.ceil(chars / F.lit(CHARS_PER_TOKEN * TOKENS_PER_PAGE)).cast("bigint")
    return F.greatest(F.lit(1).cast("bigint"), pages)


def tier_limits_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            tier,
            lims["hourly_query_limit"],
            lims["monthly_query_limit"],
            lims["ingest_limit"],
            lims["storage_file_limit"],
            lims["storage_size_limit_bytes"],
        )
        for tier, lims in TIER_LIMITS.items()
    ]
    from morphik_core_spark.plans.literal import literal_frame_from_schema

    return literal_frame_from_schema(
        spark,
        "tier string, hourly_query_limit bigint, monthly_query_limit bigint, "
        "ingest_limit bigint, storage_file_limit bigint, storage_size_limit_bytes bigint",
        rows,
    )


def usage_counters(
    events: DataFrame,
    as_of: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    chars_col: str = "chars",
    bytes_col: str = "bytes",
    query_type: str = "query",
    ingest_type: str = "ingest",
    storage_file_type: str = "storage_file",
) -> DataFrame:
    """Per-account usage counters from the event log, one aggregation pass.

    ``as_of`` (ISO timestamp literal) anchors the hourly/monthly buckets:
    hourly_query_count counts query events in the same hour-truncated
    bucket as ``as_of``, monthly in the same month bucket — the
    counter-reset semantics of user_limits_db.update_usage expressed as
    predicates. Ingest pages and storage are lifetime sums, as in the
    reference.
    """
    ts = F.col(ts_col)
    et = F.col(type_col)
    as_of_ts = F.to_timestamp(F.lit(as_of))
    in_hour = F.date_trunc("hour", ts) == F.date_trunc("hour", as_of_ts)
    in_month = F.date_trunc("month", ts) == F.date_trunc("month", as_of_ts)
    zero = F.lit(0).cast("bigint")

    return events.groupBy(user_col).agg(
        F.sum(F.when((et == query_type) & in_hour, 1).otherwise(0)).cast("bigint").alias("hourly_query_count"),
        F.sum(F.when((et == query_type) & in_month, 1).otherwise(0)).cast("bigint").alias("monthly_query_count"),
        F.coalesce(
            F.sum(F.when(et == ingest_type, estimate_pages(F.col(chars_col)))), zero
        ).alias("ingest_pages"),
        F.sum(F.when(et == storage_file_type, 1).otherwise(0)).cast("bigint").alias("storage_file_count"),
        F.coalesce(
            F.sum(F.when(et == storage_file_type, F.col(bytes_col).cast("bigint"))), zero
        ).alias("storage_size_bytes"),
    )


def check_limits(counters: DataFrame, tiers: DataFrame, tier_col: str = "tier") -> DataFrame:
    """Attach over-limit flags: counters ⋈ broadcast(tier limits).

    NULL limits (paid tiers) compare NULL → false via coalesce, which is
    exactly the reference's "only apply limits to free tier". The flags
    report the *current* counter state; the reference's prospective check
    (usage + value <= limit) is this same comparison with the candidate
    value folded in.
    """
    joined = counters.join(F.broadcast(tiers), tier_col, "left")

    def over(counter: str, limit: str) -> Column:
        return F.coalesce(F.col(counter) > F.col(limit), F.lit(False))

    return joined.select(
        *counters.columns,
        (over("hourly_query_count", "hourly_query_limit") | over("monthly_query_count", "monthly_query_limit")).alias("over_query"),
        over("ingest_pages", "ingest_limit").alias("over_ingest"),
        over("storage_file_count", "storage_file_limit").alias("over_storage_files"),
        over("storage_size_bytes", "storage_size_limit_bytes").alias("over_storage_size"),
    )
