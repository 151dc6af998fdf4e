"""Incremental aggregate state: merge == full recompute, order/shape
independence, multi-generation schema stability, NULL measures."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.operators.incremental import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)


def _events(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 20.5),
        ("a", 2, None),
        ("b", 1, 7.25),
        ("b", 3, 1.0),
        ("b", 3, 2.0),
        ("b", 3, 4.0),
    ]
    return spark.createDataFrame(rows, "k string, day int, value double")


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_full_recompute(spark):
    ev = _events(spark)
    keys = ["k", "day"]
    full = agg_state(ev, keys, {"v": "value"})
    for split in [1, 3, 6]:
        parts = [
            agg_state(ev.filter(F.col("day") <= split), keys, {"v": "value"}),
            agg_state(ev.filter(F.col("day") > split), keys, {"v": "value"}),
        ]
        merged = merge_agg_states(parts, keys)
        assert _norm(merged) == _norm(full), f"split={split}"


def test_merge_order_independent_and_regenerational(spark):
    ev = _events(spark)
    keys = ["k", "day"]
    s1 = agg_state(ev.filter("day = 1"), keys, {"v": "value"})
    s2 = agg_state(ev.filter("day = 2"), keys, {"v": "value"})
    s3 = agg_state(ev.filter("day = 3"), keys, {"v": "value"})
    ab_c = merge_agg_states([merge_agg_states([s1, s2], keys), s3], keys)
    c_ba = merge_agg_states([s3, merge_agg_states([s2, s1], keys)], keys)
    assert _norm(ab_c) == _norm(c_ba)
    # dtypes stay fixed across merge generations (no DECIMAL widening
    # creep); nullability of n legitimately differs (count vs sum-of-n)
    assert ab_c.dtypes == s1.dtypes


def test_null_measures_skipped_but_counted(spark):
    ev = _events(spark)
    state = agg_state(ev, ["k"], {"v": "value"})
    rows = {r.k: r for r in state.collect()}
    assert rows["a"].n == 3  # NULL value row still counts
    assert float(rows["a"].sum_v) == 30.5


def test_finalize_means(spark):
    ev = _events(spark)
    out = finalize_agg(agg_state(ev, ["k"], {"v": "value"}), means=["v"])
    rows = {r.k: r for r in out.collect()}
    assert rows["b"].mean_v == round(14.25 / 4, 6)
