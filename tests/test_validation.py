"""Data-quality validation suite: metric values on a synthetic frame with
known nulls/dups, empty-table NULL semantics, approx path schema parity,
and the one-scan plan contract (adding rules must not add scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from morphik_core_spark.operators.validation import profile_table, validation_suite


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(k=1, v=10.0, s="aa", lang="en"),
        Row(k=2, v=20.0, s="bbb", lang="de"),
        Row(k=2, v=None, s=None, lang="xx"),
        Row(k=None, v=40.0, s="c", lang=None),
    ]
    return spark.createDataFrame(rows)


def _lookup(df):
    return {(r.entity, r.metric): r.value for r in df.collect()}


def test_profile_metrics(frame):
    m = _lookup(
        profile_table(
            frame,
            completeness_cols=["k", "v", "s"],
            unique_cols=["k"],
            numeric_cols=["v"],
            length_cols=["s"],
            in_set={"lang": ["en", "de"]},
        )
    )
    assert m[("_table", "row_count")] == 4.0
    assert m[("k", "completeness")] == 0.75
    assert m[("v", "completeness")] == 0.75
    assert m[("s", "completeness")] == 0.75
    # 2 distinct of 3 non-null keys
    assert m[("k", "distinctness")] == round(2 / 3, 6)
    assert m[("v", "min")] == 10.0
    assert m[("v", "max")] == 40.0
    assert m[("v", "mean")] == round(70.0 / 3, 6)
    assert m[("s", "min_length")] == 1.0
    assert m[("s", "max_length")] == 3.0
    assert m[("s", "avg_length")] == 2.0
    # 2 of 3 non-null langs in the set
    assert m[("lang", "in_set_rate")] == round(2 / 3, 6)


def test_checks_pass_and_fail(frame):
    m = _lookup(
        validation_suite(
            frame,
            unique_cols=["k"],
            completeness_cols=["v"],
            numeric_cols=["v"],
            in_set={"lang": ["en", "de"]},
            min_completeness={"v": 0.5},
            min_in_set_rate={"lang": 0.9},
            numeric_range={"v": (0.0, 100.0)},
        )
    )
    assert m[("k", "check:unique")] == 0.0  # dup key 2
    assert m[("v", "check:complete")] == 1.0  # 0.75 >= 0.5
    assert m[("lang", "check:in_set")] == 0.0  # 0.667 < 0.9
    assert m[("v", "check:range")] == 1.0


def test_empty_table_ratios_null_and_checks_fail(spark):
    empty = spark.createDataFrame([], "k bigint, v double")
    m = _lookup(
        validation_suite(
            empty,
            completeness_cols=["k"],
            unique_cols=["k"],
            numeric_cols=["v"],
            min_completeness={"k": 0.5},
        )
    )
    assert m[("_table", "row_count")] == 0.0
    assert m[("k", "completeness")] is None
    assert m[("k", "distinctness")] is None
    assert m[("v", "mean")] is None
    # NULL metric -> failing gate, never a silent pass
    assert m[("k", "check:unique")] == 0.0
    assert m[("k", "check:complete")] == 0.0


def test_approx_same_schema_and_close(frame):
    exact = profile_table(frame, unique_cols=["k"])
    approx = profile_table(frame, unique_cols=["k"], approx=True)
    assert exact.columns == approx.columns
    e = _lookup(exact)[("k", "distinctness")]
    a = _lookup(approx)[("k", "distinctness")]
    assert abs(e - a) < 0.05  # HLL exact at tiny cardinalities


def test_single_scan_plan(spark, sf_dir):
    """The whole suite — metrics plus four rules — must read the table
    once: one scan node, no join/union of per-rule branches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = validation_suite(
        docs,
        completeness_cols=["doc_id", "text"],
        unique_cols=["doc_id"],
        numeric_cols=["n_chars"],
        min_completeness={"text": 0.9},
        numeric_range={"n_chars": (0.0, 1e6)},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan
    assert "Join" not in plan, plan


def test_in_set_rate_null_poison_safe(spark):
    # values NOT in the set and NULL values are both non-hits, but NULLs
    # leave the denominator too
    df = spark.createDataFrame([Row(c="a"), Row(c="b"), Row(c=None)])
    m = _lookup(profile_table(df, in_set={"c": ["a"]}))
    assert m[("c", "in_set_rate")] == 0.5


def test_dp_noisy_counts_deterministic_and_calibrated(spark):
    from morphik_core_spark.operators.validation import dp_noisy_counts

    rows = [(f"g{i % 40}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string")
    out = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=1.0, seed=3).collect()}
    assert len(out) == 40
    assert all(r["n_true"] == 100 for r in out.values())
    # deterministic: same seed reproduces exactly
    out2 = {r["g"]: tuple(r) for r in dp_noisy_counts(df, ["g"], epsilon=1.0, seed=3).collect()}
    assert {g: tuple(r) for g, r in out.items()} == out2
    # different seed moves the noise
    out3 = {r["g"]: r["noise"] for r in dp_noisy_counts(df, ["g"], epsilon=1.0, seed=4).collect()}
    assert any(out[g]["noise"] != out3[g] for g in out)
    # Laplace(1/eps=1): mean |noise| should be ~1, and noisy = true + round(noise)
    mean_abs = sum(abs(r["noise"]) for r in out.values()) / 40
    assert 0.3 < mean_abs < 3.0
    for r in out.values():
        assert r["n_noisy"] == r["n_true"] + round(r["noise"])


def test_dp_noisy_counts_epsilon_scales_noise(spark):
    from morphik_core_spark.operators.validation import dp_noisy_counts

    rows = [(f"g{i % 30}",) for i in range(300)]
    df = spark.createDataFrame(rows, "g string")
    n1 = {r["g"]: r["noise"] for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    n10 = {r["g"]: r["noise"] for r in dp_noisy_counts(df, ["g"], epsilon=10.0).collect()}
    # same u per group -> noise shrinks exactly 10x (up to the 1e-6 quantization)
    for g in n1:
        assert abs(n10[g] - n1[g] / 10) < 2e-6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


def test_schema_drift_statuses(spark):
    from morphik_core_spark.operators.validation import schema_drift

    old_rows = (
        [('{"a": "1", "b": "x", "c": "5"}',)] * 80
        + [('{"a": "2", "b": "y"}',)] * 20
    )
    new_rows = (
        [('{"a": "3", "b": "7", "d": "new"}',)] * 50      # b flips to numeric
        + [('{"a": "4"}',)] * 50                            # c vanished, b rate drops
    )
    old = spark.createDataFrame(old_rows, "props string")
    new = spark.createDataFrame(new_rows, "props string")
    out = {r["key"]: r for r in schema_drift(old, new, "props").collect()}
    assert out["d"]["status"] == "added" and out["d"]["rate_old"] is None
    assert out["c"]["status"] == "removed" and out["c"]["n_new"] == 0
    assert out["b"]["status"] == "type_changed"
    assert out["b"]["type_old"] == "string" and out["b"]["type_new"] == "numeric"
    assert out["a"]["status"] == "stable"
    assert out["a"]["rate_old"] == 1.0 and out["a"]["rate_new"] == 1.0


def test_schema_drift_rate_shift_threshold(spark):
    from morphik_core_spark.operators.validation import schema_drift

    old = spark.createDataFrame(
        [('{"k": "1"}',)] * 90 + [("{}",)] * 10, "props string"
    )
    new_small = spark.createDataFrame(
        [('{"k": "1"}',)] * 88 + [("{}",)] * 12, "props string"
    )
    new_big = spark.createDataFrame(
        [('{"k": "1"}',)] * 60 + [("{}",)] * 40, "props string"
    )
    [r1] = schema_drift(old, new_small, "props").filter("key = 'k'").collect()
    [r2] = schema_drift(old, new_big, "props").filter("key = 'k'").collect()
    assert r1["status"] == "stable"   # 0.90 -> 0.88 under the 5% default
    assert r2["status"] == "rate_shift"  # 0.90 -> 0.60
