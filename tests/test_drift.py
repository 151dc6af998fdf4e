"""Population stability index: zero drift on identical distributions,
alert on a real shift, finite terms for one-sided bins, and
partitioning invariance of the scaled-integer term sum."""

from __future__ import annotations

from morphik_core_spark.operators.analytics import population_stability


def _df(spark, rows, parts=1):
    return spark.createDataFrame(rows, "k string, vbin bigint").repartition(parts)


def test_identical_distributions_score_zero(spark):
    rows = [("t", b) for b in [0, 0, 1, 1, 2, 2]]
    out = population_stability(_df(spark, rows), _df(spark, rows), ["k"], "vbin").collect()[0]
    assert out.psi == 0.0 and not out.drift


def test_shift_triggers_drift(spark):
    base = [("t", b) for b in [0] * 50 + [1] * 50]
    cur = [("t", b) for b in [3] * 50 + [4] * 50]  # fully moved
    out = population_stability(_df(spark, base), _df(spark, cur), ["k"], "vbin").collect()[0]
    assert out.drift and out.psi > 1.0
    assert out.n_bins == 4  # union of observed bins


def test_one_sided_bin_is_finite(spark):
    base = [("t", 0)] * 10
    cur = [("t", 0)] * 9 + [("t", 7)]  # bin 7 absent from baseline
    out = population_stability(_df(spark, base), _df(spark, cur), ["k"], "vbin").collect()[0]
    assert out.psi == out.psi and out.psi < 1e9  # finite, not NaN/inf


def test_partitioning_invariant(spark):
    base = [("t", i % 5) for i in range(200)] + [("u", i % 3) for i in range(90)]
    cur = [("t", (i + 1) % 5) for i in range(180)] + [("u", i % 4) for i in range(100)]
    a = sorted(map(tuple, population_stability(
        _df(spark, base, 1), _df(spark, cur, 1), ["k"], "vbin").collect()))
    b = sorted(map(tuple, population_stability(
        _df(spark, base, 13), _df(spark, cur, 7), ["k"], "vbin").collect()))
    assert a == b
