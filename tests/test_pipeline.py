"""End-to-end curation pipeline: stage monotonicity, audit consistency,
determinism across runs, and shard-plan integrity."""

from __future__ import annotations

from morphik_core_spark.pipeline import run_curation_pipeline
from morphik_core_spark.sources.tables import load_table

RATES = {f"src{i}": 40 + (13 * i) % 61 for i in range(20)}


def _run(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return run_curation_pipeline(docs, mixture_rates=RATES, n_shards=8)


def test_pipeline_stages_and_shards(spark, sf_dir):
    curated, audit, stats = _run(spark, sf_dir)
    names = [s["stage"] for s in stats]
    assert names == [
        "language_id", "quality_filter", "exact_dedup", "near_dedup",
        "decontaminate", "mixture_sample", "training_shards",
    ]
    # stage chaining: rows_in of each stage == rows_out of the previous
    for prev, nxt in zip(stats, stats[1:]):
        assert nxt["rows_in"] == prev["rows_out"]
    # something survives AND something is dropped overall
    assert 0 < stats[-1]["rows_out"] < stats[0]["rows_in"]
    # the curated frame matches the audit totals
    n_final = curated.count()
    assert n_final == stats[-1]["rows_out"]
    shards = audit.collect()
    assert sum(r["n_docs"] for r in shards) == n_final
    assert all(r["tokens"] > 0 for r in shards)


def test_pipeline_deterministic(spark, sf_dir):
    c1, _, s1 = _run(spark, sf_dir)
    c2, _, s2 = _run(spark, sf_dir)
    assert s1 == s2
    ids1 = sorted(r.doc_id for r in c1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in c2.select("doc_id").collect())
    assert ids1 == ids2
