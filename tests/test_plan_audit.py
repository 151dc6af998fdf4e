"""plans/audit: each rule fires on a crafted offender and stays quiet
on the clean twin; assert_plan_clean gates errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from morphik_core_spark.plans.audit import assert_plan_clean, audit_plan


def _rules(findings):
    return {f.rule for f in findings}


def test_cartesian_flagged(spark):
    a = spark.createDataFrame([(1,), (2,)], "a int")
    b = spark.createDataFrame([(3,), (4,)], "b int")
    bad = a.crossJoin(b).filter("a < b")  # no equi-key: real cartesian
    assert "cartesian" in _rules(audit_plan(bad)) or "nested-loop" in _rules(
        audit_plan(bad)
    )
    good = a.join(b, a["a"] == b["b"])
    clean = audit_plan(good)
    assert "cartesian" not in _rules(clean)


def test_row_python_flagged_arrow_not(spark):
    df = spark.createDataFrame([(1,)], "x int")
    slow = df.select(F.udf(lambda x: x + 1, "int")("x").alias("y"))
    assert "row-python" in _rules(audit_plan(slow))
    with pytest.raises(AssertionError, match="row-python"):
        assert_plan_clean(slow)

    import pandas as pd

    def fast_iter(it):
        for pdf in it:
            yield pdf

    fast = df.mapInPandas(fast_iter, "x int")
    assert "row-python" not in _rules(audit_plan(fast))
    assert_plan_clean(fast)


def test_global_window_flagged_partitioned_not(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k int, v double")
    g = df.withColumn("r", F.ntile(2).over(Window.orderBy("v")))
    assert "global-window" in _rules(audit_plan(g))
    p = df.withColumn("r", F.ntile(2).over(Window.partitionBy("k").orderBy("v")))
    assert "global-window" not in _rules(audit_plan(p))
    # warnings pass the default gate, fail the strict one
    assert_plan_clean(g)
    with pytest.raises(AssertionError, match="global-window"):
        assert_plan_clean(g, allow_warnings=False)


def test_exchange_budget(spark):
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    two_shuffles = df.groupBy("k").count().orderBy("count")
    assert "exchange-budget" in _rules(audit_plan(two_shuffles, max_exchanges=0))
    assert "exchange-budget" not in _rules(audit_plan(two_shuffles, max_exchanges=8))


def test_driver_queries_pass_error_gate(spark, sf_dir):
    """Spot-check: real driver queries audit clean at the error level
    (the parametrized twin of tests/test_all_query_plans.py)."""
    import __spark_entry__ as em

    for name in ["semi_join_auth", "balance_deciles", "drift_psi"]:
        assert_plan_clean(em.queries()[name](spark, sf_dir))
