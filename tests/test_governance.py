"""Unit tests for the governance / experimentation batch: k-anonymity
classes, Benford digit screen, WOE/IV hand-computed parity, A/B z-test
(hand-computed z + zero-SE guard), and MMR diversification (the greedy
pick must actually trade relevance for diversity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from morphik_core_spark.operators.analytics import Z_CRIT_95, ab_test_summary
from morphik_core_spark.operators.curation import woe_iv
from morphik_core_spark.operators.rerank import mmr_diversify
from morphik_core_spark.operators.validation import (
    BENFORD_EXPECTED,
    benford_audit,
    k_anonymity_audit,
)


def test_k_anonymity_classes_and_l_diversity(spark):
    # QI (g): class a has 3 rows / 2 sensitive values; b has 2 rows with
    # one sensitive value (homogeneous = l-diversity failure); c singleton
    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"),
        ("b", "z"), ("b", "z"),
        ("c", "w"),
    ]
    df = spark.createDataFrame(rows, "g string, sens string")
    out = {r["class_size"]: r for r in k_anonymity_audit(df, ["g"], "sens", k=3).collect()}
    assert out[3]["n_classes"] == 1 and out[3]["at_risk"] is False
    assert out[3]["min_l"] == 2 and out[3]["max_l"] == 2
    assert out[2]["at_risk"] is True and out[2]["min_l"] == 1
    assert out[1]["n_rows"] == 1 and out[1]["row_share"] == round(1 / 6, 6)


def test_benford_audit_counts_and_spine(spark):
    # 19 positive values: first digits 1x10, 2x5, 9x4; plus excluded rows
    vals = [1.0] * 4 + [0.1] * 3 + [123.0] * 3 + [2.5] * 5 + [900.0] * 4 + [0.0, -5.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v", []).collect()}
    assert len(out) == 9  # spine emits every digit
    assert out[1]["n"] == 10 and out[2]["n"] == 5 and out[9]["n"] == 4
    assert out[3]["n"] == 0  # missing digit still present
    assert out[1]["observed"] == round(10 / 19, 6)
    assert out[1]["expected"] == round(BENFORD_EXPECTED[1], 6)
    assert out[2]["abs_dev"] == round(abs(5 / 19 - BENFORD_EXPECTED[2]), 6)


def test_woe_iv_hand_computed(spark):
    rows = [("a", 1)] * 3 + [("a", 0)] * 1 + [("b", 1)] * 1 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["category"]: r for r in woe_iv(df, "cat", "y").collect()}
    gpos, gneg = 4, 6
    pa, na = (3 + 0.5) / (gpos + 0.5), (1 + 0.5) / (gneg + 0.5)
    pb, nb = (1 + 0.5) / (gpos + 0.5), (5 + 0.5) / (gneg + 0.5)
    assert out["a"]["woe"] == round(math.log(pa / na), 6)
    assert out["b"]["woe"] == round(math.log(pb / nb), 6)
    assert out["a"]["iv_term"] == round((pa - na) * math.log(pa / na), 6)
    iv_total = round(
        (round((pa - na) * math.log(pa / na) * 1e12) + round((pb - nb) * math.log(pb / nb) * 1e12))
        / 1e12,
        6,
    )
    assert out["a"]["iv_total"] == iv_total == out["b"]["iv_total"]
    # 'a' is positive-heavy, 'b' negative-heavy: opposite WOE signs
    assert out["a"]["woe"] > 0 > out["b"]["woe"]


def test_ab_test_z_and_zero_se_guard(spark):
    # control 100 users / 50 conv; treat 100 / 70 -> z = 2.88 (hand calc)
    rows = [("control", i, i < 50) for i in range(100)]
    rows += [("t", 1000 + i, i < 70) for i in range(100)]
    df = spark.createDataFrame(rows, "variant string, user long, conv boolean")
    out = ab_test_summary(df, "variant", "user", "conv", control="control").collect()
    assert len(out) == 1
    r = out[0]
    p, n = (50 + 70) / 200, 100
    z = (0.7 - 0.5) / math.sqrt(p * (1 - p) * (2 / n))
    assert r["z_score"] == round(z, 6)
    assert r["lift"] == round(0.2, 6)
    assert r["significant"] is (abs(round(z, 6)) > Z_CRIT_95) is True
    # all-converting arms: pooled rate 1 -> z NULL, not a divide error
    rows2 = [("control", i, True) for i in range(10)] + [("t", 100 + i, True) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "variant string, user long, conv boolean")
    r2 = ab_test_summary(df2, "variant", "user", "conv", control="control").collect()[0]
    assert r2["z_score"] is None and r2["significant"] is None


def test_mmr_trades_relevance_for_diversity(spark):
    # cand 1: best score; cand 2: near-clone of 1 with 2nd-best score;
    # cand 3: orthogonal, lower score. MMR must pick 3 before 2.
    rows = [
        (0, 1, 0.95, [1.0, 0.0, 0.0]),
        (0, 2, 0.94, [0.999, 0.01, 0.0]),
        (0, 3, 0.80, [0.0, 1.0, 0.0]),
        (0, 4, 0.70, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "q long, id long, score double, vec array<double>")
    out = mmr_diversify(df, "q", "id", "score", "vec", lam=0.5, k=3).collect()
    picked = {r["rank"]: r["id"] for r in out}
    assert picked == {1: 1, 2: 3, 3: 4}
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["mmr_score"] == 0.95  # rank 1 = pure relevance
    # rank 2 objective: 0.5*0.80 - 0.5*cos(3,1)=0.4 - 0.0
    assert by_rank[2]["mmr_score"] == round(0.5 * 0.80, 6)


def test_mmr_rank1_is_top_score_per_query_with_tiebreak(spark):
    rows = [
        (7, 10, 0.9, [1.0, 0.0]),
        (7, 11, 0.9, [0.0, 1.0]),  # tie -> lower id wins
        (8, 20, 0.5, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "q long, id long, score double, vec array<double>")
    out = mmr_diversify(df, "q", "id", "score", "vec", lam=0.5, k=2).collect()
    r1 = {r["q"]: r["id"] for r in out if r["rank"] == 1}
    assert r1 == {7: 10, 8: 20}
    # query 8 has only one candidate: no rank-2 row for it
    assert [r for r in out if r["q"] == 8 and r["rank"] == 2] == []


def test_table_diff_change_types_and_columns(spark):
    """All four verdicts with NULL-safe column semantics: NULL->NULL is
    unchanged, NULL->value and value->NULL are changes, and changed_cols
    lists differing columns in declaration order."""
    from morphik_core_spark.operators.validation import table_diff

    a = spark.createDataFrame(
        [
            (1, "x", 10.0),       # unchanged
            (2, "y", None),       # changed: v NULL -> value
            (3, None, 3.0),       # changed: s NULL stays NULL (unchanged col), v changes
            (4, "gone", 4.0),     # removed
        ],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [
            (1, "x", 10.0),
            (2, "y", 2.5),
            (3, None, 3.5),
            (5, "new", 5.0),      # added
        ],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in table_diff(a, b, ["k"]).collect()}
    assert out[1]["change_type"] == "unchanged" and out[1]["changed_cols"] == []
    assert out[2]["change_type"] == "changed" and out[2]["changed_cols"] == ["v"]
    assert out[3]["change_type"] == "changed" and out[3]["changed_cols"] == ["v"]
    assert out[4]["change_type"] == "removed" and out[4]["changed_cols"] == []
    assert out[5]["change_type"] == "added" and out[5]["changed_cols"] == []


def test_table_diff_multi_column_and_explicit_compare(spark):
    """Multiple differing columns list in declaration order; restricting
    compare_cols ignores changes outside it."""
    from morphik_core_spark.operators.validation import table_diff

    a = spark.createDataFrame([(1, "s1", 1.0, "m1")], "k long, s string, v double, m string")
    b = spark.createDataFrame([(1, "s2", 2.0, "m2")], "k long, s string, v double, m string")
    full = table_diff(a, b, ["k"]).collect()[0]
    assert full["changed_cols"] == ["s", "v", "m"]
    limited = table_diff(a, b, ["k"], compare_cols=["v"]).collect()[0]
    assert limited["change_type"] == "changed" and limited["changed_cols"] == ["v"]
