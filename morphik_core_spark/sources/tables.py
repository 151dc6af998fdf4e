"""Parquet table loaders for the synthetic star schema + document tables.

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free. At 100 TB the same call reads a
partitioned table directory; nothing here assumes single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-joinable. At 100 TB scale the
# fact tables (lineitem/orders/events/documents/embeddings) shuffle; these
# never should.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# NTZ wall clock taken as UTC -> epoch-micros instant, with NO reference to
# the session timezone: date + time-of-day field arithmetic only. cast(ntz
# as date), date_part(HOUR/MINUTE/SECOND, ntz) and unix_date are all pure
# wall-clock field extractions, and date_part('SECOND') is DECIMAL(8,6) so
# the *1e6 is exact. This keeps the lazy plan correct no matter what the
# session timezone is when it finally executes.
_NTZ_AS_UTC_INSTANT = (
    "timestamp_micros("
    "unix_date(cast(ts as date)) * 86400000000 + "
    "cast(date_part('HOUR', ts) as bigint) * 3600000000 + "
    "cast(date_part('MINUTE', ts) as bigint) * 60000000 + "
    "cast(date_part('SECOND', ts) * 1000000 as bigint))"
)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name != "events":
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    # events.parquet has shipped as TIMESTAMP(NANOS) and as
    # TIMESTAMP(MICROS, NTZ) in different testdata vintages, and callers
    # may hand us a foreign SparkSession with its own confs — so never
    # assume the arrival type. Every vintage is normalized to a proper
    # instant (`timestamp`) whose epoch value equals the stored wall clock
    # read as UTC — exactly DuckDB's naive TIMESTAMP — via session-
    # timezone-INDEPENDENT expressions, so the lazy conversions stay
    # correct even if the caller changes the timezone later.
    #
    # The session timezone is NOT mutated here (it is restored below).
    # Note for callers: downstream *rendering* of instants is still
    # session-tz-sensitive — `date_trunc`/`hour()` bucket in session-local
    # wall clock and `collect()` renders instants in the session timezone.
    # Sessions built by `morphik_core_spark.session.get_spark` pin UTC;
    # foreign sessions wanting DuckDB-naive parity must pin UTC themselves
    # (cf. `__spark_entry__._t`, which does exactly that at the harness
    # boundary).
    prior_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type != "bigint":
        # Not the nanos vintage: the conf played no part in this schema, so
        # restore it. For the nanos vintage it MUST stay set — the file
        # scan re-consults it at action time (the hadoopConf snapshot is
        # taken per-action, not at read()), and unsetting it would turn a
        # working load into an execution-time "Illegal Parquet type" error.
        if prior_nanos is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior_nanos)
    if ts_type == "bigint":
        # nanos-as-long: truncate to µs exactly like DuckDB reading ns
        # parquet. `div` = integer division (plain / round-trips the
        # ~1e18 ns value through double and loses precision).
        # timestamp_micros() is epoch-based — session-tz-independent.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.expr(_NTZ_AS_UTC_INSTANT))
    elif ts_type != "timestamp":
        # a new vintage must fail AT LOAD, not as silent NULLs in
        # downstream query results
        raise TypeError(
            f"events.ts arrived as {ts_type!r}; expected timestamp, "
            "timestamp_ntz, or bigint (nanos-as-long). New testdata "
            "vintage? Extend load_table deliberately."
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
