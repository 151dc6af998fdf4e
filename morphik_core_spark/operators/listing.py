"""Listing / pagination / count operators.

Spark restatement of the reference's document listing surface
(/root/reference/core/database/postgres_database.py:448-723):

- sorted pagination with NULLS LAST and a stable ``external_id ASC``
  tiebreak (:624-646, :521-528)
- skip/limit with the fetch-``limit+1`` has_more trick (:529-556)
- column projection so listings never drag the full content (:647-723)
- status / folder / generic value counts with COALESCE-NULLIF
  normalization (:559-590)

Scale note: OFFSET pagination is inherently a global sort; Catalyst plans
TakeOrderedAndProject for limit+offset which keeps only (skip+limit) rows
per partition. For deep pagination at 100 TB, keyset pagination
(WHERE sort_key > last_seen) is the right pattern — exposed via
``keyset_page``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sorted_page", "keyset_page", "value_counts", "folder_counts", "project"]

_DEFAULT_TIEBREAK = "external_id"


def _order_cols(sort_by: str, order: str, tiebreak: str | None) -> list[Column]:
    col = F.col(sort_by)
    primary = col.desc_nulls_last() if order.lower() == "desc" else col.asc_nulls_last()
    cols = [primary]
    if tiebreak and tiebreak != sort_by:
        cols.append(F.col(tiebreak).asc())
    return cols


def sorted_page(
    df: DataFrame,
    sort_by: str = "updated_at",
    order: str = "desc",
    skip: int = 0,
    limit: int = 100,
    tiebreak: str | None = _DEFAULT_TIEBREAK,
) -> DataFrame:
    """One page of a stable listing (NULLS LAST + tiebreak), offset/limit."""
    out = df.orderBy(*_order_cols(sort_by, order, tiebreak))
    if skip:
        out = out.offset(skip)
    return out.limit(limit)


def keyset_page(
    df: DataFrame,
    last_seen: tuple | None,
    sort_by: str = "updated_at",
    order: str = "desc",
    limit: int = 100,
    tiebreak: str = _DEFAULT_TIEBREAK,
) -> DataFrame:
    """Keyset (seek) pagination — the scale-friendly variant.

    ``last_seen`` is (sort_value, tiebreak_value) from the previous page's
    final row; pass None for the first page.
    """
    out = df
    if last_seen is not None:
        sv, tv = last_seen
        col, tie = F.col(sort_by), F.col(tiebreak)
        if order.lower() == "desc":
            out = out.filter((col < F.lit(sv)) | ((col == F.lit(sv)) & (tie > F.lit(tv))))
        else:
            out = out.filter((col > F.lit(sv)) | ((col == F.lit(sv)) & (tie > F.lit(tv))))
    return out.orderBy(*_order_cols(sort_by, order, tiebreak)).limit(limit)


def value_counts(df: DataFrame, column: str, unknown_label: str = "unknown") -> DataFrame:
    """GROUP BY with ''/NULL folded into a label (reference :559-573)."""
    key = F.coalesce(F.nullif(F.col(column), F.lit("")), F.lit(unknown_label)).alias(column)
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("count"))


def folder_counts(df: DataFrame, path_col: str = "folder_path", name_col: str = "folder_name") -> DataFrame:
    """Doc counts per folder, keyed on COALESCE(path, name), NULLS FIRST (:575-590)."""
    key = F.coalesce(F.col(path_col), F.col(name_col)).alias("folder")
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("folder").asc_nulls_first())
    )


def project(df: DataFrame, fields: Sequence[str] | None, always: Sequence[str] = ("external_id",)) -> DataFrame:
    """Minimal-column projection for listings (reference :647-723).

    Catalyst prunes the parquet scan to exactly these columns — the
    free-by-construction analog of the reference's deferred loading.
    """
    if not fields:
        return df
    keep, seen = [], set()
    for c in list(always) + list(fields):
        if c in df.columns and c not in seen:
            keep.append(c)
            seen.add(c)
    return df.select(*keep)
