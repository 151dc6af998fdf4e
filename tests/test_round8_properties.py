"""Property-based invariants for the round-8 statistical operators:
mathematical identities that must hold on ANY input, not just the
hand-computed fixtures (the repo's hypothesis test tier)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 4)), min_size=30, max_size=120))
def test_chi2_nonnegative_and_zero_on_product_structure(spark, pairs):
    """chi2 >= 0 always; and on a PERFECT product distribution (every
    (x, y) combo with count nx*ny) independence holds exactly -> chi2 == 0."""
    from morphik_core_spark.operators.analytics import chi_square_independence

    df = _rows(spark, [(f"x{a}", f"y{b}") for a, b in pairs], "x string, y string")
    [r] = chi_square_independence(df, "x", "y").collect()
    assert r["chi2"] >= 0.0
    assert 0.0 <= (r["cramers_v"] or 0.0) <= 1.0 + 1e-9

    xs = sorted({a for a, _ in pairs})
    ys = sorted({b for _, b in pairs})
    prod = [
        (f"x{a}", f"y{b}")
        for a in xs for b in ys
        for _ in range(sum(1 for p, _ in pairs if p == a) * sum(1 for _, q in pairs if q == b))
    ]
    if len(prod) <= 4000:
        [r0] = chi_square_independence(
            _rows(spark, prod, "x string, y string"), "x", "y"
        ).collect()
        assert r0["chi2"] == 0.0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(1, 50), min_size=12, max_size=40),
    st.lists(st.integers(1, 50), min_size=12, max_size=40),
)
def test_jsd_symmetry_and_ln2_bound(spark, left, right):
    from morphik_core_spark.operators.analytics import js_divergence

    rows = [("l", f"c{v % 7}") for v in left] + [("r", f"c{(v * 3) % 9}") for v in right]
    df = _rows(spark, rows, "s string, c string")
    [f] = js_divergence(df, "s", "c", "l", "r").collect()
    [b] = js_divergence(df, "s", "c", "r", "l").collect()
    assert f["jsd_nats"] == b["jsd_nats"]
    assert -1e-9 <= f["jsd_nats"] <= math.log(2) + 1e-9


@settings(max_examples=8, deadline=None)
@given(st.integers(2, 9), st.integers(50, 300))
def test_hill_alpha_scale_invariant(spark, mult, n):
    """The Hill tail index is invariant to multiplying every value by a
    positive constant (it only sees RATIOS of order statistics)."""
    from morphik_core_spark.operators.analytics import hill_tail_index

    vals = [float((i / n) ** -0.6) for i in range(1, n + 1)]
    a = hill_tail_index(
        _rows(spark, [(v,) for v in vals], "v double"), "v", k=min(40, n // 3),
        value_scale=10**6,
    ).collect()[0]
    b = hill_tail_index(
        _rows(spark, [(v * mult,) for v in vals], "v double"), "v",
        k=min(40, n // 3), value_scale=10**6,
    ).collect()[0]
    # quantization at value_scale makes this near- not bit-exact
    assert abs(a["xi"] - b["xi"]) < 0.02 * max(abs(a["xi"]), 1e-9)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 60), st.booleans()), min_size=16, max_size=60))
def test_log_rank_antisymmetric_in_groups(spark, subjects):
    """Swapping the two group labels must negate z exactly and keep chi2."""
    from morphik_core_spark.operators.analytics import log_rank_test

    rows = [("a" if i % 2 else "b", t, int(e)) for i, (t, e) in enumerate(subjects)]
    if not any(e for _, _, e in rows):
        return  # no events -> empty aggregate, nothing to compare
    df = _rows(spark, rows, "g string, t long, e int")
    [f] = log_rank_test(df, "g", "t", "e", "a", "b").collect()
    [b] = log_rank_test(df, "g", "t", "e", "b", "a").collect()
    if f["z"] is not None and b["z"] is not None:
        assert abs(f["z"] + b["z"]) < 2e-6
        assert abs(f["chi2"] - b["chi2"]) < 4e-6
    assert f["o1"] + b["o1"] == sum(e for _, _, e in rows)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=20, max_size=100, unique=True))
def test_spearman_perfect_monotone_and_negation(spark, xs):
    """Any strictly increasing map gives rho == 1; negating one side
    gives rho == -1 (distinct values, no ties)."""
    from morphik_core_spark.operators.analytics import spearman_corr

    rows = [(float(x), float(x * x + 3)) for x in xs]
    [r] = spearman_corr(_rows(spark, rows, "x double, y double"), "x", "y").collect()
    assert r["rho"] == 1.0
    rows_n = [(float(x), -float(x * x + 3)) for x in xs]
    [rn] = spearman_corr(_rows(spark, rows_n, "x double, y double"), "x", "y").collect()
    assert rn["rho"] == -1.0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=30, max_size=100))
def test_corr_matrix_diag_consistency(spark, xs):
    """corr(x, x+const) == 1 within rounding; corr is symmetric in the
    pair order the operator never emits twice."""
    from morphik_core_spark.operators.analytics import corr_matrix

    if len(set(xs)) < 2:
        return
    rows = [(float(v), float(v + 7), float((v * 31) % 17)) for v in xs]
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(
        _rows(spark, rows, "a double, b double, c double"), ["a", "b", "c"]
    ).collect()}
    assert out[("a", "b")] == 1.0
    assert len(out) == 3
    assert all(abs(v) <= 1.0 + 1e-9 for v in out.values())
