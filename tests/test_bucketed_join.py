"""Bucketed chunk-table layout: joins on the bucket key must not shuffle
the fact table — the co-location claim from plans/partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.plans.partitioning import explain_has


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    chunks = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("document_id"),
        (F.col("id") % 7).alias("chunk_number"),
        F.md5(F.col("id").cast("string")).alias("content"),
    )
    docs = spark.range(0, 500).select(
        F.col("id").alias("document_id"), F.lit("completed").alias("status")
    )
    for name, df in (("t_chunks_b", chunks), ("t_docs_b", docs)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "document_id")
            .sortBy("document_id")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield "t_chunks_b", "t_docs_b"
    for name in ("t_chunks_b", "t_docs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_elides_shuffle(spark, bucketed_tables):
    """Sort-merge over two tables bucketed on the key: no hash shuffle
    (buckets are pre-partitioned and pre-sorted). The broadcast plan is
    excluded via the merge hint so the assertion targets bucketing."""
    chunks_t, docs_t = bucketed_tables
    joined = spark.table(chunks_t).join(spark.table(docs_t).hint("merge"), "document_id")
    flags = explain_has(joined, "Exchange", "SortMergeJoin")
    assert flags["SortMergeJoin"]
    assert not flags["Exchange"], "bucketed join must not shuffle"
    assert joined.count() == 10_000


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same sort-merge join without bucketing shuffles (so
    the assertion above is meaningful)."""
    chunks_t, _ = bucketed_tables
    plain_docs = spark.range(0, 500).select(
        F.col("id").alias("document_id"), F.lit("completed").alias("status")
    )
    joined = spark.table(chunks_t).join(plain_docs.hint("merge"), "document_id")
    flags = explain_has(joined, "Exchange")
    assert flags["Exchange"]
