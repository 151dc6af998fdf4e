"""Sketch operators: HLL distinct, count-min, bloom prefilter — plus the
round's other additions (PMI, span dedup, moving windows). Accuracy and
invariant tests; cross-engine exactness is covered by test_oracle_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.sketches import (
    bloom_bits,
    bloom_pass_keys,
    cms_estimates,
    cms_sketch,
    hll_distinct,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # group 'big': 3000 distinct values; group 'small': 25 distinct
    rows = [("big", f"v{i}") for i in range(3000)] + [
        ("small", f"w{i % 25}") for i in range(500)
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_estimates_within_error_bound(keyed):
    out = {r["g"]: r for r in hll_distinct(keyed, ["g"], "v", p=9).collect()}
    # sigma ~= 1.04/sqrt(512) ~= 4.6%; allow 4 sigma
    assert abs(out["big"]["distinct_est"] - 3000) / 3000 < 0.19
    # small group lands in the linear-counting regime and is near-exact
    assert abs(out["small"]["distinct_est"] - 25) / 25 < 0.15
    assert out["small"]["registers_used"] <= 25


def test_hll_register_table_is_bounded(keyed):
    out = hll_distinct(keyed, ["g"], "v", p=6).collect()
    assert all(r["registers_used"] <= 64 for r in out)


def test_hll_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y")], "g string, v string"
    )
    [r] = hll_distinct(df, ["g"], "v", p=9).collect()
    # 2 distinct non-null values -> linear counting gives ~2
    assert r["registers_used"] == 2
    assert abs(r["distinct_est"] - 2) < 0.1


def test_cms_never_underestimates_and_min_tightens(spark):
    rows = [(f"t{i % 30}",) for i in range(900)] + [("hot",)] * 300
    toks = spark.createDataFrame(rows, "tok string")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # deliberately tight sketch: collisions guaranteed (31 tokens, 16 buckets)
    sketch = cms_sketch(counts, "tok", "n", depth=3, width=16)
    est = cms_estimates(counts, sketch, "tok", depth=3, width=16).collect()
    exact = {r["tok"]: r["n"] for r in counts.collect()}
    assert len(est) == 31
    for r in est:
        assert r["cms_est"] >= exact[r["tok"]]  # CMS one-sided error
    # a wide sketch has no collisions: estimates exact
    wide = cms_sketch(counts, "tok", "n", depth=3, width=4096)
    est_w = cms_estimates(counts, wide, "tok", depth=3, width=4096).collect()
    assert all(r["cms_est"] == exact[r["tok"]] for r in est_w)


def test_cms_sketch_size_is_depth_x_width_bounded(spark):
    counts = spark.createDataFrame(
        [(f"t{i}", i + 1) for i in range(200)], "tok string, n int"
    )
    sk = cms_sketch(counts, "tok", "n", depth=3, width=16)
    assert sk.count() <= 3 * 16
    # total mass preserved per depth row
    per_depth = {r["depth_i"]: r["s"] for r in sk.groupBy("depth_i").agg(F.sum("bucket_count").alias("s")).collect()}
    total = sum(range(1, 201))
    assert per_depth == {0: total, 1: total, 2: total}


def test_bloom_has_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "k int")
    probes = spark.createDataFrame([(i,) for i in range(400)], "k int")
    bits = bloom_bits(members, "k", num_bits=4096, num_hashes=3)
    assert bits.count() <= 4096
    passed = {r["k"] for r in bloom_pass_keys(probes, "k", bits, num_bits=4096, num_hashes=3).collect()}
    member_set = set(range(0, 400, 2))
    assert member_set <= passed  # every member passes
    # false positives exist but are a small fraction at this fill rate
    fp = passed - member_set
    assert len(fp) < 100


def test_pmi_flags_a_planted_collocation(spark):
    from morphik_core_spark.operators.text_analysis import pmi_bigrams

    # 'hong kong' always adjacent; filler words shuffled independently
    rows = []
    filler = ["a", "b", "c", "d", "e", "f"]
    for i in range(40):
        w = filler[i % 6], filler[(i + 2) % 6], filler[(i + 4) % 6]
        rows.append((f"{w[0]} hong kong {w[1]} {w[2]}",))
    df = spark.createDataFrame(rows, "text string")
    out = pmi_bigrams(df, "text", min_count=5, k=5).collect()
    assert out[0]["w1"] == "hong" and out[0]["w2"] == "kong"
    # pmi ~= ln(N) for a perfect pair; definitely > 1
    assert out[0]["pmi"] > 1.0


def test_span_dedup_coverage_counts(spark):
    from morphik_core_spark.operators.dedup import span_dedup

    shared = "alpha beta gamma delta"  # one 4-gram, shared by docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, shared + " unique one here now"),
            (2, "other words " + shared),
            (3, "totally different text with no overlap at all"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id", n=4).collect()}
    assert out[1]["dup_tokens"] == 4 and out[2]["dup_tokens"] == 4
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_fraction"] == 0.0
    assert out[1]["dup_fraction"] == round(4 / 8, 6)


def test_moving_aggregates_window_math(spark):
    from decimal import Decimal

    from morphik_core_spark.operators.sessions import moving_aggregates

    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=i), i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, value double")
    out = {r["event_id"]: r for r in moving_aggregates(df, "user_id", "ts", "event_id", "value").collect()}
    assert out[0]["mov_cnt"] == 1 and out[0]["mov_sum"] == Decimal("0.000000")
    assert out[9]["mov_cnt"] == 6  # 5 preceding + current
    assert out[9]["mov_sum"] == Decimal(str(sum(range(4, 10)))).quantize(Decimal("0.000001"))
    assert out[9]["mov_min"] == 4.0 and out[9]["mov_max"] == 9.0


def test_cms_join_size_exact_when_no_collisions(spark):
    """With width far above the distinct-key count the inner product is
    exact: estimate == Σ a_k · b_k."""
    from morphik_core_spark.operators.sketches import cms_join_size_estimate

    a = spark.createDataFrame([(f"k{i}", (i % 3) + 1) for i in range(10)], "k string, c long")
    b = spark.createDataFrame([(f"k{i}", (i % 4) + 1) for i in range(0, 20, 2)], "k string, c long")
    [r] = cms_join_size_estimate(a, b, "k", "c", depth=3, width=4096).collect()
    import collections
    ca = collections.Counter()
    cb = collections.Counter()
    for i in range(10):
        ca[f"k{i}"] += (i % 3) + 1
    for i in range(0, 20, 2):
        cb[f"k{i}"] += (i % 4) + 1
    exact = sum(ca[k] * cb[k] for k in ca if k in cb)
    assert r["exact_join_size"] == exact
    assert r["estimate"] == exact and r["rel_error"] == 0.0


def test_cms_join_size_always_upper_bound_and_tightens(spark):
    """Collisions only add mass: estimate >= exact at any width, and a
    wider sketch is never worse (on the same data and hash family)."""
    from morphik_core_spark.operators.sketches import cms_join_size_estimate

    a = spark.createDataFrame(
        [(f"u{i % 37}", 1) for i in range(800)], "k string, c long"
    )
    b = spark.createDataFrame(
        [(f"u{(i * 3) % 53}", 1) for i in range(600)], "k string, c long"
    )
    [tight] = cms_join_size_estimate(a, b, "k", "c", depth=3, width=8).collect()
    [wide] = cms_join_size_estimate(a, b, "k", "c", depth=3, width=256).collect()
    assert tight["estimate"] >= tight["exact_join_size"]
    assert wide["estimate"] >= wide["exact_join_size"]
    assert wide["estimate"] <= tight["estimate"]
    assert tight["exact_join_size"] == wide["exact_join_size"]
