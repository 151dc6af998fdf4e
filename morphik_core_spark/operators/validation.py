"""Data-quality validation suite: one-pass table profiling + declarative
constraint checks (the Deequ/Great-Expectations-shaped stage every
large-scale pipeline runs before training data leaves the door).

Extension beyond the reference surface (morphik-core validates rows
imperatively at the API edge — Pydantic models in `core/models/*.py` —
and has no corpus-level quality gate); at 100 TB the equivalent gate has
to be ONE aggregation pass, not a per-rule scan.

Design for scale:

- Every metric — row count, per-column completeness, key distinctness,
  numeric min/max/mean, string length stats, set-membership rates — AND
  every constraint verdict derives from a SINGLE ``df.agg(...)`` over one
  scan. Partial aggregation collapses each partition to one row, so the
  shuffle carries O(partitions) rows regardless of table size, and
  adding a rule never adds a scan.
- Exact distinct counts use Spark's count-distinct expand (one extra
  local expand, still one scan). For 100 TB key-uniqueness audits swap
  ``approx=True`` to HLL ``approx_count_distinct`` — same output schema,
  documented estimator error, no expand.
- Ratios divide exact BIGINT counts inside a fixed ROUND(x, 6) tree and
  means accumulate in DECIMAL, so aggregation order can never change a
  verdict (the determinism contract every operator here follows).
- Checks compare against the same ROUND(6) expressions the metric rows
  expose, so a reported 0.9 never fails a ``>= 0.9`` rule by hidden ulps.

Output is long-format ``(entity, metric, value)`` — stable schema no
matter which rules a caller enables, so downstream alerting/diffing
works table-agnostically.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "validation_suite"]


def _ratio(num: Column, den: Column) -> Column:
    """Exact-int division through one fixed double tree, NULL when the
    denominator is 0 (an empty table has no completeness, not 0%)."""
    return F.when(
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    ).otherwise(F.lit(None).cast("double"))


def _profile_exprs(
    completeness_cols: Sequence[str],
    unique_cols: Sequence[str],
    numeric_cols: Sequence[str],
    length_cols: Sequence[str],
    in_set: Mapping[str, Sequence[str]],
    approx: bool,
) -> tuple[list[Column], dict[tuple[str, str], Column]]:
    """Aggregate expressions for the single pass + the (entity, metric)
    -> post-aggregate value expression map both metrics and checks read."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in dict.fromkeys(list(completeness_cols) + list(unique_cols) + list(in_set)):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
    for c in unique_cols:
        d = (
            F.approx_count_distinct(c) if approx else F.countDistinct(F.col(c))
        ).alias(f"__d_{c}")
        aggs.append(d)
    for c in numeric_cols:
        aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        aggs.append(F.sum(F.col(c).cast("decimal(27,6)")).alias(f"__sum_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
    for c in length_cols:
        ln = F.length(F.col(c))
        aggs.append(F.min(ln).cast("double").alias(f"__minlen_{c}"))
        aggs.append(F.max(ln).cast("double").alias(f"__maxlen_{c}"))
        aggs.append(F.sum(ln.cast("decimal(27,6)")).alias(f"__sumlen_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__cntlen_{c}"))
    for c, allowed in in_set.items():
        hit = F.when(F.col(c).isin(list(allowed)), F.lit(1)).otherwise(F.lit(0))
        aggs.append(F.sum(hit).alias(f"__inset_{c}"))

    n = F.col("__n")

    def mean_of(sum_col: str, cnt_col: str) -> Column:
        return F.when(
            F.col(cnt_col) > 0,
            F.round(F.col(sum_col).cast("double") / F.col(cnt_col).cast("double"), 6),
        )

    vals: dict[tuple[str, str], Column] = {("_table", "row_count"): n.cast("double")}
    for c in completeness_cols:
        vals[(c, "completeness")] = _ratio(F.col(f"__nn_{c}"), n)
    for c in unique_cols:
        vals[(c, "distinctness")] = _ratio(F.col(f"__d_{c}"), F.col(f"__nn_{c}"))
    for c in numeric_cols:
        vals[(c, "min")] = F.col(f"__min_{c}")
        vals[(c, "max")] = F.col(f"__max_{c}")
        vals[(c, "mean")] = mean_of(f"__sum_{c}", f"__cnt_{c}")
    for c in length_cols:
        vals[(c, "min_length")] = F.col(f"__minlen_{c}")
        vals[(c, "max_length")] = F.col(f"__maxlen_{c}")
        vals[(c, "avg_length")] = mean_of(f"__sumlen_{c}", f"__cntlen_{c}")
    for c in in_set:
        vals[(c, "in_set_rate")] = _ratio(F.col(f"__inset_{c}"), F.col(f"__nn_{c}"))
    return aggs, vals


def _explode_long(one: DataFrame, rows: list[Column]) -> DataFrame:
    return one.select(F.explode(F.array(*rows)).alias("m")).select(
        "m.entity", "m.metric", "m.value"
    )


def _row(entity: str, metric: str, value: Column) -> Column:
    return F.struct(
        F.lit(entity).alias("entity"),
        F.lit(metric).alias("metric"),
        value.cast("double").alias("value"),
    )


def profile_table(
    df: DataFrame,
    *,
    completeness_cols: Sequence[str] = (),
    unique_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    length_cols: Sequence[str] = (),
    in_set: Mapping[str, Sequence[str]] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``df`` in one aggregation pass.

    Returns a long-format frame ``(entity string, metric string, value
    double)`` with one row per metric:

    - ``('_table', 'row_count')``
    - ``(col, 'completeness')`` — non-null fraction, per ``completeness_cols``
    - ``(col, 'distinctness')`` — distinct / non-null, per ``unique_cols``
    - ``(col, 'min' | 'max' | 'mean')`` per ``numeric_cols`` (mean via
      DECIMAL-exact sum)
    - ``(col, 'min_length' | 'max_length' | 'avg_length')`` per ``length_cols``
    - ``(col, 'in_set_rate')`` — fraction of non-null values inside the
      allowed set, per ``in_set`` entry

    ``approx=True`` swaps exact count-distinct for HLL — the 100 TB
    path; everything else is identical.
    """
    aggs, vals = _profile_exprs(
        completeness_cols, unique_cols, numeric_cols, length_cols,
        dict(in_set or {}), approx,
    )
    one = df.agg(*aggs)
    rows = [_row(e, m, v) for (e, m), v in vals.items()]
    return _explode_long(one, rows)


def validation_suite(
    df: DataFrame,
    *,
    completeness_cols: Sequence[str] = (),
    unique_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    length_cols: Sequence[str] = (),
    in_set: Mapping[str, Sequence[str]] | None = None,
    min_completeness: Mapping[str, float] | None = None,
    min_in_set_rate: Mapping[str, float] | None = None,
    numeric_range: Mapping[str, tuple[float, float]] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Metrics + pass/fail constraint rows in the same long frame, still
    one scan: the check structs are extra projections of the same
    aggregate row the metric structs come from.

    Check rows use ``metric='check:<rule>'`` with value 1.0 (pass) /
    0.0 (fail); a NULL metric fails its rule (a gate you could not
    compute is not a passing gate).
    """
    aggs, vals = _profile_exprs(
        completeness_cols, unique_cols, numeric_cols, length_cols,
        dict(in_set or {}), approx,
    )
    one = df.agg(*aggs)
    rows = [_row(e, m, v) for (e, m), v in vals.items()]

    def check(entity: str, name: str, passed: Column) -> None:
        verdict = F.coalesce(passed, F.lit(False)).cast("int")
        rows.append(_row(entity, f"check:{name}", verdict))

    for c in unique_cols:
        check(c, "unique", vals[(c, "distinctness")] >= F.lit(1.0))
    for c, thr in dict(min_completeness or {}).items():
        check(c, "complete", vals[(c, "completeness")] >= F.lit(float(thr)))
    for c, thr in dict(min_in_set_rate or {}).items():
        check(c, "in_set", vals[(c, "in_set_rate")] >= F.lit(float(thr)))
    for c, (lo, hi) in dict(numeric_range or {}).items():
        check(
            c,
            "range",
            (vals[(c, "min")] >= F.lit(float(lo)))
            & (vals[(c, "max")] <= F.lit(float(hi))),
        )
    return _explode_long(one, rows)
