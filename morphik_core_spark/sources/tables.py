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


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS). Set the legacy conf at
        # read time so the loader works with ANY SparkSession (the driver
        # harness builds its own, bypassing session.get_spark). Runtime-
        # settable on Spark 4.x; without it the read fails with
        # PARQUET_TYPE_ILLEGAL.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # parquet TIMESTAMP(NANOS) arrives as long (see session.py);
        # truncate to µs exactly like DuckDB does when reading ns parquet.
        # `div` = integer division (a plain / would round-trip the ~1e18
        # ns value through double and lose precision).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
