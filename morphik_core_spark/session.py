"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); production target is a
multi-executor cluster reading ~100 TB, so every knob here is chosen to
scale: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (pandas-UDF kernels), UTC session timezone (oracle
parity with DuckDB, whose timestamps are UTC-naive).

``spark.sql.shuffle.partitions`` defaults to the local core count; on a
real cluster it should be ~2-3x total executor cores (AQE coalesces the
excess at runtime, so erring high is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "morphik_core_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    Honors $SPARK_GRAFT_CPUS for local parallelism so the bench driver
    controls core count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing (the default) is deliberate: at
        # local scale most shuffles are KB-sized but CPU-heavy (regex
        # normalize, explodes), and size-targeted coalescing
        # (parallelismFirst=false + 64m advisory) collapses those onto
        # one core — measured net-slower across the bench in round 6
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long, loader converts to µs timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
