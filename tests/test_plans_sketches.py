"""Plan-shape assertions for the sketch/window operators added late in
round 4: the properties that make them scale (bounded shuffles, broadcast
sketch joins, no cartesians, no Python in the hot path) pinned in the
physical plan. No-shuffle assertions keep a shuffling control nearby so
they can't pass vacuously (NOTES.md lesson)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [("g%d" % (i % 3), "v%d" % i) for i in range(300)]
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_plan_two_shuffles_no_python(keyed):
    from morphik_core_spark.operators.sketches import hll_distinct

    plan = _plan(hll_distinct(keyed, ["g"], "v", p=9))
    # one shuffle to (g, reg), one to (g) — the whole point vs
    # countDistinct is that both carry at most groups x m rows
    assert plan.count("Exchange") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan  # partial/final pairs, map-side combine


def test_cms_estimates_broadcast_the_sketch(spark, keyed):
    from morphik_core_spark.operators.sketches import cms_estimates, cms_sketch

    counts = keyed.groupBy(F.col("v").alias("tok")).agg(F.count(F.lit(1)).alias("n"))
    sketch = cms_sketch(counts, "tok", "n", depth=3, width=16)
    plan = _plan(cms_estimates(counts, sketch, "tok", depth=3, width=16))
    assert "BroadcastHashJoin" in plan  # depth*width rows ride a broadcast
    assert "CartesianProduct" not in plan


def test_bloom_membership_is_broadcast_join(spark):
    from morphik_core_spark.operators.sketches import bloom_bits, bloom_pass_keys

    members = spark.createDataFrame([(i,) for i in range(100)], "k int")
    probes = spark.createDataFrame([(i,) for i in range(500)], "k int")
    bits = bloom_bits(members, "k", num_bits=4096, num_hashes=3)
    plan = _plan(bloom_pass_keys(probes, "k", bits, num_bits=4096, num_hashes=3))
    assert "BroadcastHashJoin" in plan  # bits table is <= num_bits rows
    # the fact side never shuffles for the join itself — only the
    # key-grouped count does
    assert "CartesianProduct" not in plan


def test_span_dedup_no_cartesian_gram_join(spark):
    from morphik_core_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(i, "w%d x y z a b c" % (i % 5)) for i in range(40)], "doc_id int, text string"
    )
    plan = _plan(span_dedup(docs, "text", "doc_id", n=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # gram join is an equi-join


def test_moving_aggregates_single_window_shuffle(spark):
    import datetime

    from morphik_core_spark.operators.sessions import moving_aggregates

    base = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i % 4, base + datetime.timedelta(seconds=i), i, float(i)) for i in range(40)],
        "user_id int, ts timestamp, event_id int, value double",
    )
    plan = _plan(moving_aggregates(df, "user_id", "ts", "event_id", "value"))
    assert plan.count("Exchange") == 1  # one hash partition by key
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_pmi_totals_ride_broadcasts_not_cartesians(spark):
    from morphik_core_spark.operators.text_analysis import pmi_bigrams

    docs = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)] * 30, "text string"
    )
    plan = _plan(pmi_bigrams(docs, "text", min_count=2, k=10))
    assert "CartesianProduct" not in plan
    # the two 1-row totals join via broadcast nested loop (no key), which
    # is the correct plan for scalar attachment
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_sq8_scoring_is_codegen_with_broadcast_stats(spark):
    from morphik_core_spark.operators.similarity import knn_sq8

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], "q_id long, qv array<double>")
    plan = _plan(knn_sq8(emb, q, k=5, dims=4))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats + query batch broadcast
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
