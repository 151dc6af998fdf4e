"""End-to-end curation pipeline: raw documents → training-ready shard
plan, composed entirely from this package's oracle-checked operators —
the "switch your corpus pipeline to this engine" demonstration in one
call, with a per-stage audit trail.

Stage order follows the published playbooks (C4 / Gopher / RefinedWeb /
LLaMA): cheap page-local filters first (language, quality) so the
expensive cross-document stages (exact + near dedup, decontamination)
see the smallest possible corpus, then mixture weighting, then the
deterministic shard plan. Every stage is the library operator the
driver queries already verify; this module only sequences them and
counts what each stage dropped.

Scale shape: stages 1-2 are pure maps; stage 3 is one md5 groupBy;
stage 4 is the banded-LSH pair generator (bucket-capped) + checkpointed
connected components; stage 5 broadcasts the eval-shingle set; stage 6
is a broadcast-rates map-side filter; stage 7 is the single
training_shards shuffle. Nothing all-pairs, nothing corpus-sized on the
driver — the same invariants SCALE.md pins for each operator
individually hold for the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphik_core_spark.functions.text import token_count
from morphik_core_spark.operators import curation, dedup
from morphik_core_spark.operators.text_analysis import language_id

__all__ = ["run_curation_pipeline", "curation_funnel"]


def run_curation_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    minhash_bands: int = 4,
    minhash_rows: int = 2,
    max_bucket_size: int = 200,
    mixture_rates: dict[str, int] | None = None,
    n_shards: int = 16,
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Run the full curation chain. Returns (curated_docs, shard_audit,
    stage_stats) where stage_stats is a list of {stage, rows_in,
    rows_out, dropped} dicts in execution order (each stage counts once
    — the audit costs one extra action per stage, acceptable for a
    pipeline run that writes terabytes; pass precomputed counts at true
    scale if even that matters).

    curated_docs carries the input columns; shard_audit is the
    `training_shards` per-shard report over the surviving corpus.
    """
    stats: list[dict] = []

    def stage(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        n_in, n_out = before.count(), after.count()
        stats.append(
            {"stage": name, "rows_in": n_in, "rows_out": n_out, "dropped": n_in - n_out}
        )
        return after

    base = docs.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))

    # 1. language gate (map-side)
    lang = language_id(base, text_col, id_col)
    kept_lang = base.join(
        lang.filter(F.col("pred_lang").isin(list(keep_langs))).select(id_col),
        id_col,
        "left_semi",
    )
    cur = stage("language_id", base, kept_lang)

    # 2. quality rules (map-side)
    q = curation.quality_filter(cur, text_col, id_col)
    kept_q = cur.join(q.filter(F.col("passes")).select(id_col), id_col, "left_semi")
    cur = stage("quality_filter", cur, kept_q)

    # 3. exact dedup (one md5 groupBy; keeper = min id)
    ex = dedup.exact_duplicates(cur, text_col, id_col)
    kept_ex = cur.join(
        ex.filter(F.col(id_col) == F.col("keeper_id")).select(id_col), id_col, "left_semi"
    )
    cur = stage("exact_dedup", cur, kept_ex)

    # 4. near dedup: shingles -> MinHash -> banded LSH -> CC -> keeper
    sh = dedup.word_shingles(cur, text_col, id_col)
    sig = dedup.minhash_signatures(sh, id_col, num_hashes=minhash_bands * minhash_rows)
    pairs = dedup.lsh_candidate_pairs(
        sig, id_col, bands=minhash_bands, rows_per_band=minhash_rows,
        max_bucket_size=max_bucket_size,
    )
    clusters = dedup.resolve_duplicate_clusters(cur, pairs, id_col)
    kept_near = cur.join(
        clusters.filter(F.col(id_col) == F.col("keeper_id")).select(id_col),
        id_col,
        "left_semi",
    )
    cur = stage("near_dedup", cur, kept_near)

    # 5. train/eval decontamination (broadcast eval shingles; train side only)
    dec = curation.decontaminate(cur, text_col, id_col)
    kept_dec = cur.join(
        dec.filter(~F.col("contaminated")).select(id_col), id_col, "left_semi"
    )
    cur = stage("decontaminate", cur, kept_dec)

    # 6. mixture weighting (broadcast rates, map-side hash filter)
    if mixture_rates:
        mixed = curation.mixture_sample(cur, id_col, source_col, mixture_rates)
        kept_mix = cur.join(mixed.select(id_col), id_col, "left_semi")
        cur = stage("mixture_sample", cur, kept_mix)

    # 7. deterministic shard plan (ONE shuffle)
    with_tokens = cur.withColumn("_tokens", token_count(F.col(text_col)))
    audit = curation.training_shards(
        with_tokens, id_col, "_tokens", source_col, n_shards=n_shards
    )
    stats.append(
        {
            "stage": "training_shards",
            "rows_in": stats[-1]["rows_out"],
            "rows_out": stats[-1]["rows_out"],
            "dropped": 0,
        }
    )
    return cur, audit, stats


def curation_funnel(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    lang_col: str | None = None,
) -> DataFrame:
    """Single-pass funnel audit for the cheap curation stages: how many
    documents survive input → language gate → quality rules → exact
    dedup, as (stage_idx, stage, n_docs) rows — the retention funnel
    every pipeline run reports, computed WITHOUT running the pipeline
    (no per-stage actions, one relational plan; the relational twin of
    ``run_curation_pipeline``'s counted stage_stats for its stages 1-3).

    Semantics match the sequential pipeline exactly: each stage's
    predicate is evaluated on the documents that survived the previous
    stage — in particular the exact-dedup keeper is the min doc id per
    fingerprint AMONG quality-surviving docs (a duplicate group whose
    keeper failed quality elects a new keeper, just as running dedup
    after the filter would).

    The language gate reads ``lang_col`` (a declared/metadata language
    column) when given, else runs the `language_id` detector — both are
    real deployments (crawl corpora trust the detector; curated corpora
    trust their metadata).

    Plan: 1:1 joins on ``id_col`` (language + quality signal frames —
    both map-side expression pipelines over the same scan), one
    fingerprint window for the keeper, one global 4-counter aggregate
    unpivoted with ``stack``. No corpus-sized collect, no self-join.
    """
    from pyspark.sql import Window

    base = docs.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
    qual = curation.quality_filter(base, text_col, id_col).select(id_col, "passes")
    flags = base.select(
        F.col(id_col),
        F.md5(dedup.normalize_text(F.col(text_col))).alias("_fp"),
        *([F.col(lang_col)] if lang_col else []),
    )
    if lang_col is None:
        lang = language_id(base, text_col, id_col).select(id_col, "pred_lang")
        flags = flags.join(lang, id_col).withColumn(
            "_f1", F.col("pred_lang").isin(list(keep_langs))
        )
    else:
        flags = flags.withColumn("_f1", F.col(lang_col).isin(list(keep_langs)))
    flags = flags.join(qual, id_col).withColumn("_f2", F.col("_f1") & F.col("passes"))
    keeper = F.min(F.when(F.col("_f2"), F.col(id_col))).over(
        Window.partitionBy("_fp")
    )
    flags = flags.withColumn("_f3", F.col("_f2") & (F.col(id_col) == keeper))
    agg = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("_f1").cast("bigint")).alias("s1"),
        F.sum(F.col("_f2").cast("bigint")).alias("s2"),
        F.sum(F.col("_f3").cast("bigint")).alias("s3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 0, 'input', s0, 1, 'language_id', s1, "
            "2, 'quality_filter', s2, 3, 'exact_dedup', s3) "
            "AS (stage_idx, stage, n_docs)"
        )
    )
