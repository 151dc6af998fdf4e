"""Plan-shape assertions for the round-5 governance/ML-eval/time-series
families: the scale properties claimed in the docstrings are visible in
the physical plan, so pin them there. Each no-shuffle / bounded-shuffle
assertion has a shuffling control so it can't pass vacuously."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(df) -> int:
    # count shuffle exchanges only (BroadcastExchange is the cheap path
    # these ops are SUPPOSED to use for their one-row/dim-sized sides)
    return _plan(df).count("Exchange hashpartitioning") + _plan(df).count(
        "Exchange rangepartitioning"
    ) + _plan(df).count("Exchange SinglePartition")


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, f"g{i % 5}", i % 97, (i * 37) % 1000) for i in range(500)]
    return spark.createDataFrame(rows, "id long, g string, x long, y long")


def test_numeric_corr_is_one_aggregation_pass(frame):
    from morphik_core_spark.operators.analytics import numeric_corr

    df = numeric_corr(frame, ["x", "y", "id"])
    plan = _plan(df)
    # all moments come from ONE global aggregate: a single
    # SinglePartition exchange feeding the final agg, reused by every
    # pair row (no per-pair rescans of the fact table)
    assert plan.count("Scan ExistingRDD") <= 3 or plan.count("LocalTableScan") <= 3
    assert "BatchEvalPython" not in plan


def test_woe_iv_shuffles_category_rows_only(spark):
    from morphik_core_spark.operators.curation import woe_iv

    rows = [(f"c{i % 7}", i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "cat string, y int")
    plan = _plan(woe_iv(df, "cat", "y"))
    # the one-row global and the IV total ride broadcasts, never a join
    # shuffle of the category frame
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_ab_test_control_is_broadcast(spark):
    from morphik_core_spark.operators.analytics import ab_test_summary

    rows = [(f"v{i % 3}", i, i % 4 == 0) for i in range(400)]
    df = spark.createDataFrame(rows, "variant string, unit long, conv boolean")
    plan = _plan(ab_test_summary(df, "variant", "unit", "conv", control="v0"))
    assert "BroadcastExchange" in plan and "SortMergeJoin" not in plan


def test_k_anonymity_second_shuffle_is_class_sized(frame):
    from morphik_core_spark.operators.validation import k_anonymity_audit

    df = k_anonymity_audit(frame, ["g", "x"], "y", k=5)
    # two shrinking hash shuffles (QI classes, then class sizes); the
    # total broadcast adds no shuffle of the class frame
    assert _exchanges(df) <= 4
    assert "BatchEvalPython" not in _plan(df)


def test_mad_outliers_windows_partition_by_group(frame):
    from morphik_core_spark.operators.analytics import mad_outliers

    plan = _plan(mad_outliers(frame, "g", "y"))
    # every window must be keyed by the group — an unpartitioned window
    # over the grid would print 'Window [..], [..]' with no partition
    # spec (two bracket groups instead of three; NOTES.md plan-string
    # fact used by plans/audit)
    for line in plan.splitlines():
        if line.strip().startswith("Window ["):
            assert line.count("], [") >= 2, line
    assert "BatchEvalPython" not in plan


def test_survival_curve_windows_are_grid_sized_inputs(spark):
    from morphik_core_spark.operators.analytics import survival_curve

    rows = [(i % 10 + 1, i % 7 != 0) for i in range(300)]
    df = spark.createDataFrame(rows, "t long, e boolean").select(
        "t", F.col("e").cast("int").alias("e")
    )
    plan = _plan(survival_curve(df, "t", "e"))
    # the fact frame collapses to the duration grid BEFORE any window:
    # the per-t aggregate's partial combine appears below the first sort
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan


def test_benford_shuffle_carries_digit_rows(spark):
    from morphik_core_spark.operators.validation import benford_audit

    rows = [(f"g{i % 3}", float(i % 899) + 1.0) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = benford_audit(df, "v", ["g"])
    plan = _plan(out)
    assert "BroadcastExchange" in plan  # 9-row spine + group totals
    assert "BatchEvalPython" not in plan
