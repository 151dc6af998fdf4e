"""plans/ranking: exact_global_rank and ntile_from_rank must reproduce
row_number/ntile exactly — they are the no-global-sort decomposition
the ranked operators (gains_table, quality_ensemble, curriculum_order)
run on."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from morphik_core_spark.plans.ranking import exact_global_rank, ntile_from_rank


def test_exact_global_rank_matches_row_number(spark):
    rows = [(i, (i * 7) % 13) for i in range(57)]  # heavy value ties
    df = spark.createDataFrame(rows, "id long, v long")
    for asc in (True, False):
        order = F.col("v").asc() if asc else F.col("v").desc()
        expect = {
            r.id: r.rn
            for r in df.select(
                "id", F.row_number().over(Window.orderBy(order, F.col("id").asc())).alias("rn")
            ).collect()
        }
        got = {r.id: r.rank for r in exact_global_rank(df, "v", "id", ascending=asc).collect()}
        assert got == expect


def test_exact_global_rank_partition_invariant(spark):
    rows = [(i, (i * 11) % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = sorted(map(tuple, exact_global_rank(df, "v", "id").collect()))
    b = sorted(map(tuple, exact_global_rank(df.repartition(17), "v", "id").collect()))
    assert a == b


def test_ntile_from_rank_matches_ntile(spark):
    # uneven splits: N=23, k=5 -> buckets of 5,5,5,4,4
    for n, k in ((23, 5), (20, 4), (7, 10), (1, 3)):
        df = spark.range(1, n + 1).withColumnRenamed("id", "r")
        expect = {
            r.r: r.b
            for r in spark.range(1, n + 1)
            .select(F.col("id").alias("r"), F.ntile(k).over(Window.orderBy("id")).alias("b"))
            .collect()
        }
        got = {
            r.r: r.b
            for r in df.withColumn("n", F.lit(n)).select(
                "r", ntile_from_rank("r", "n", k).alias("b")
            ).collect()
        }
        assert got == expect, (n, k)
