"""Text scalar functions (SURVEY §2.7): cleaning, normalization, token
counting, filename normalization + lightweight FTS ranking.

All built-in expressions — one codegen'd scan, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "clean_control_chars",
    "normalize_whitespace",
    "token_count",
    "normalize_filename",
    "filename_search",
]

# C0 control chars except \t \n \r (reference text_utils.rs:120-140,
# fast_ops.py:22-26)
_CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_control_chars(col: Column) -> Column:
    return F.regexp_replace(col, _CONTROL_CHARS, "")


def normalize_whitespace(col: Column) -> Column:
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def token_count(col: Column) -> Column:
    """Whitespace token count (the reference's cheap token estimate)."""
    return F.when(F.length(F.trim(col)) == 0, 0).otherwise(
        F.size(F.split(normalize_whitespace(col), " "))
    )


def normalize_filename(col: Column) -> Column:
    """Strip extension, fold [_-]+ to spaces, lowercase — the reference's
    FTS normalization (postgres_database.py:2739-2749)."""
    no_ext = F.regexp_replace(col, r"\.[^.]+$", "")
    return F.lower(F.trim(F.regexp_replace(no_ext, r"[_\-]+", " ")))


def filename_search(
    df: DataFrame,
    query: str,
    filename_col: str = "filename",
    recency_col: str = "updated_at",
    limit: int = 50,
) -> DataFrame:
    """ts_rank-lite: overlap of normalized filename tokens with query tokens,
    recency tiebreak (reference postgres_database.py:2700-2790)."""
    q_tokens = [t for t in query.lower().split() if t]
    name_tokens = F.split(normalize_filename(F.col(filename_col)), " ")
    q_arr = F.array(*[F.lit(t) for t in q_tokens])
    hits = F.size(F.array_intersect(name_tokens, q_arr))
    rank = (hits / F.greatest(F.size(name_tokens), F.lit(1))).alias("rank")
    out = df.withColumn("rank", rank).filter(F.col("rank") > 0)
    order = [F.col("rank").desc()]
    if recency_col in df.columns:
        order.append(F.col(recency_col).desc_nulls_last())
    return out.orderBy(*order).limit(limit)
