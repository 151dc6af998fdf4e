"""Bloom data skipping: cross-language hash agreement, no false
negatives under any probe set, real file-set reduction, stale-index
safety, and the unindexed fallback."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from morphik_core_spark.plans.skipping import (
    _py_bit,
    prune_files,
    scan_with_bloom,
    write_bloom_index,
)


def _table(spark, tmp_path, n_files=8, rows_per=200):
    path = str(tmp_path / "tbl")
    df = spark.range(n_files * rows_per).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # key-ranged files so a point lookup SHOULD touch exactly one file
    df.repartitionByRange(n_files, "k").write.mode("overwrite").parquet(path)
    return path


def test_python_hash_matches_spark(spark):
    from morphik_core_spark.operators.dedup import portable_hash

    vals = [0, 12345, 99999999]
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    for j in range(3):
        got = df.select(
            (portable_hash(F.concat(F.lit(f"bloom{j}|"), F.col("k").cast("string"))) % 4096).alias("b")
        ).collect()
        for v, r in zip(vals, got):
            assert r.b == _py_bit(v, j, 4096), (v, j)


def test_prune_keeps_all_hits_and_reduces_files(spark, tmp_path):
    path = _table(spark, tmp_path)
    write_bloom_index(spark, path, "k")
    n_data_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])

    for probe in ([3], [3, 777], [1500, 1501]):
        kept = prune_files(path, probe)
        # correctness: scan_with_bloom == full-scan filter, exactly
        got = sorted(r.k for r in scan_with_bloom(spark, path, "k", probe).collect())
        want = sorted(
            r.k for r in spark.read.parquet(path).filter(F.col("k").isin(probe)).collect()
        )
        assert got == want == sorted(probe)
        # skipping: a point probe must NOT touch every file
        assert len(kept) < n_data_files, (probe, len(kept), n_data_files)

    # absent key: may prune to zero files; result must be empty
    assert scan_with_bloom(spark, path, "k", [10_000_000]).count() == 0


def test_stale_index_keeps_new_files(spark, tmp_path):
    path = _table(spark, tmp_path)
    write_bloom_index(spark, path, "k")
    # append AFTER indexing: new file absent from manifest -> always kept
    spark.createDataFrame([(9_999_999, 0)], "k bigint, v bigint").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    got = scan_with_bloom(spark, path, "k", [9_999_999]).collect()
    assert [r.k for r in got] == [9_999_999]


def test_unindexed_falls_back_to_full_scan(spark, tmp_path):
    path = _table(spark, tmp_path)
    assert prune_files(path, [1]) is None
    assert scan_with_bloom(spark, path, "k", [1]).count() == 1


def test_partitioned_layout_prunes_within_partitions(spark, tmp_path):
    """Hive-partitioned tables: manifest keys are root-relative paths,
    so pruning works INSIDE partition directories and the partition
    column survives the leaf-file read (basePath)."""
    path = str(tmp_path / "ptbl")
    df = spark.range(800).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    df.repartitionByRange(4, "k").write.partitionBy("p").mode("overwrite").parquet(path)
    write_bloom_index(spark, path, "k")

    got = scan_with_bloom(spark, path, "k", [17]).collect()
    assert [(r.k, r.p) for r in got] == [(17, 1)]  # partition col intact
    all_files = [
        os.path.join(d, f)
        for d, _s, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    kept = prune_files(path, [17])
    assert 0 < len(kept) < len(all_files)
