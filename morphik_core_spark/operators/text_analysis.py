"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Pipeline-extension operators (not in the reference's surface) for
training-data curation. Everything is built-in expressions — these run
inside whole-stage codegen over the raw text column, one scan, no shuffle
(fingerprint/quality are pure per-row; langid is per-row against small
literal stopword arrays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morphik_core_spark.operators.dedup import normalize_text

__all__ = ["tokens", "text_stats", "language_id", "fingerprint", "STOPWORDS"]

# compact stopword profiles for the heuristic language scorer
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pas", "pour"],
}


def tokens(text: Column) -> Column:
    return F.split(normalize_text(text), " ")


def text_stats(df: DataFrame, text_col: str, id_col: str, decimals: int = 6) -> DataFrame:
    """(id, token_cnt, stop_cnt, stop_ratio, avg_token_len, quality).

    quality: simple curation score — stopword ratio (fluency proxy) damped
    by degenerate token-length penalty. Deterministic and oracle-friendly;
    swap the formula freely, the plan shape is the point.
    """
    tk = tokens(F.col(text_col))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    token_cnt = F.size("tk")
    stop_cnt = F.size(F.expr("filter(tk, x -> array_contains(en_arr, x))"))
    total_len = F.aggregate(F.transform(F.col("tk"), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x)
    out = (
        df.select(F.col(id_col), tk.alias("tk"))
        .withColumn("en_arr", en)
        .select(
            F.col(id_col),
            token_cnt.alias("token_cnt"),
            stop_cnt.alias("stop_cnt"),
            total_len.alias("total_len"),
        )
        .withColumn("stop_ratio", F.round(F.col("stop_cnt") / F.col("token_cnt"), decimals))
        .withColumn("avg_token_len", F.round(F.col("total_len") / F.col("token_cnt"), decimals))
    )
    # quality is computed from RAW counts, not the rounded ratio: ratio*0.5
    # puts every odd 6th digit exactly on a .5 rounding boundary, where
    # Spark (HALF_UP) and other engines (nearest-double) disagree.
    quality = F.round(
        F.col("stop_cnt") * 0.5 / F.col("token_cnt")
        + F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 10), 0.5).otherwise(0.0),
        decimals,
    )
    return out.select(id_col, "token_cnt", "stop_cnt", "stop_ratio", "avg_token_len", quality.alias("quality"))


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pred_lang): argmax of per-language stopword hits, ties broken
    by profile order (en > de > fr)."""
    tk = tokens(F.col(text_col))
    base = df.select(F.col(id_col), tk.alias("tk"))
    scores = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        base = base.withColumn(f"arr_{lang}", arr)
        scores[lang] = F.size(F.expr(f"filter(tk, x -> array_contains(arr_{lang}, x))"))
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), F.lit("en"))
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return base.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, fp): md5 of the normalized text — the exact-dedup key, exposed
    as a standalone fingerprinting op."""
    return df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
