"""Plan-shape assertions for the round-4 operators: the properties that
make them scale are visible in the physical plan, so pin them there.
Every no-shuffle assertion has a shuffling control so it can't pass
vacuously (NOTES.md lesson)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(str(i), f"some text body {i} join window", 30 + i) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id string, text string, n_chars int")


def test_pii_scrub_is_single_scan_no_shuffle(docs):
    from morphik_core_spark.operators.curation import pii_scrub

    plan = _plan(pii_scrub(docs, "text", "doc_id"))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    # control: a groupBy on the same frame DOES show an Exchange
    assert "Exchange" in _plan(docs.groupBy("n_chars").count())


def test_url_filter_is_single_scan_no_shuffle(docs):
    from morphik_core_spark.operators.curation import url_filter

    urls = docs.withColumn("url", F.concat(F.lit("https://h"), F.col("doc_id"), F.lit(".com/x")))
    plan = _plan(url_filter(urls, "url", "doc_id", ["bad.com"]))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_filename_fts_rank_is_codegen_no_udf(docs):
    from morphik_core_spark.functions.text import (
        normalize_filename, plainto_lexemes, ts_rank, tsvector_lexemes,
    )

    named = docs.withColumn("filename", F.concat(F.col("doc_id"), F.lit("_report.txt")))
    lex = tsvector_lexemes(normalize_filename(F.col("filename")))
    out = named.select("doc_id", ts_rank(lex, plainto_lexemes("report")).alias("rank"))
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_perplexity_shuffle_count_is_bounded(docs):
    """Bigram counts + per-doc aggregate: the plan may shuffle for the
    aggregates/joins but must NOT fall into a cartesian on the fact side
    (the vocab scalar rides a broadcast)."""
    from morphik_core_spark.operators.curation import perplexity_scores

    plan = _plan(perplexity_scores(docs, "text", "doc_id"))
    assert "BroadcastNestedLoopJoin" in plan  # vocab one-row broadcast
    assert "CartesianProduct" not in plan


def test_gapfill_grid_has_no_python_and_joins_on_key(spark):
    from datetime import datetime

    from morphik_core_spark.operators.sessions import time_bucket_gapfill

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, i), float(i)) for i in range(6)],
        "user_id long, ts timestamp, value double",
    )
    plan = _plan(time_bucket_gapfill(df, bucket_secs=3600))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_single_exchange_no_join(spark):
    """The round-5 as-of shape: probe payload rides the window sort as a
    struct, so the whole operator is ONE exchange (the per-key sort) and
    ZERO joins — the join-back that doubled the largest shuffle is gone
    and must stay gone."""
    from morphik_core_spark.operators.asof import (
        asof_backward,
        asof_forward,
        asof_nearest,
    )

    from datetime import datetime

    probes = spark.createDataFrame(
        [(1, 10, datetime(2024, 1, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    series = spark.createDataFrame(
        [(10, datetime(2024, 1, 1, 0))], "user_id long, ts timestamp"
    )
    for fn in (asof_backward, asof_forward, asof_nearest):
        plan = _plan(fn(probes, series, key="user_id"))
        assert plan.count("Exchange") == 1, (fn.__name__, plan)
        assert "Join" not in plan, (fn.__name__, plan)
