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

__all__ = [
    "profile_table",
    "validation_suite",
    "referential_orphans",
    "json_schema_profile",
    "k_anonymity_audit",
    "l_diversity_classes",
    "t_closeness_classes",
    "benford_audit",
    "BENFORD_EXPECTED",
    "dp_noisy_counts",
    "schema_drift",
    "table_diff",
]


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


def referential_orphans(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, fact, fact_key, dim,
    dim_key) edge, count fact rows whose key has no match in the
    dimension — the FK-orphan check a warehouse runs after every load
    (Deequ's ``isContainedIn`` / dbt's ``relationships`` test).

    Output: one row per edge — (edge, n_rows, n_orphans,
    n_orphan_keys). NULL fact keys count as orphans (they reference
    nothing), consistent with the strict FK reading.

    Scale: edges that pass the SAME fact DataFrame object share ONE scan
    of it — all their key columns project together, each dimension's
    distinct keys broadcast-left-join in sequence, and one aggregate
    emits every edge's conditional counts (exploded back to per-edge
    rows). Distinct facts still audit independently; no fact shuffle
    either way. Counts are exact integers over the identical joined row
    set, so the merged form is bit-for-bit the per-edge form.
    """
    groups: dict[int, list[int]] = {}
    for i, (_, fact, *_rest) in enumerate(edges):
        groups.setdefault(id(fact), []).append(i)
    parts = []
    for idxs in groups.values():
        fact = edges[idxs[0]][1]
        joined = fact.select(
            *[F.col(edges[i][2]).alias(f"_fk{i}") for i in idxs]
        )
        for i in idxs:
            _, _, _, dim, dim_key = edges[i]
            keys = dim.select(F.col(dim_key).alias(f"_k{i}")).distinct()
            joined = joined.join(
                F.broadcast(keys), F.col(f"_fk{i}") == F.col(f"_k{i}"), "left"
            )
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i in idxs:
            aggs.append(
                F.sum(F.when(F.col(f"_k{i}").isNull(), 1).otherwise(0)).alias(
                    f"_no{i}"
                )
            )
            aggs.append(
                F.countDistinct(
                    F.when(F.col(f"_k{i}").isNull(), F.col(f"_fk{i}"))
                ).alias(f"_nk{i}")
            )
        row = joined.agg(*aggs)
        parts.append(
            row.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(edges[i][0]).alias("edge"),
                                F.col("n_rows"),
                                F.col(f"_no{i}").alias("n_orphans"),
                                F.col(f"_nk{i}").alias("n_orphan_keys"),
                            )
                            for i in idxs
                        ]
                    )
                ).alias("_e")
            ).select("_e.edge", "_e.n_rows", "_e.n_orphans", "_e.n_orphan_keys")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def json_schema_profile(
    df: DataFrame,
    json_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Schema inference over a semi-structured JSON string column: per
    top-level key, how often it appears, how often its value parses as a
    number, its distinct-value count, and the min/max string value — the
    profiling pass that decides which JSON props are promotable to typed
    columns (Snowflake VARIANT / BigQuery JSON schema auto-detection).

    Output: (key, n_present, present_rate, n_numeric, n_distinct,
    min_value, max_value), over rows whose ``json_col`` parses as a JSON
    object. Values are compared AS STRINGS (the storage form) — numeric
    promotion is what ``n_numeric`` is for.

    Scale: one explode of the per-row key list (bounded by object
    width), one groupBy on key — map-side combined except the exact
    distinct, which the 100 TB path swaps for HLL.
    """
    total = df.agg(F.count(F.when(F.col(json_col).isNotNull(), 1)).alias("_n"))
    kv = (
        df.filter(F.col(json_col).isNotNull())
        .select(
            F.explode(
                F.map_entries(F.from_json(F.col(json_col), "map<string,string>"))
            ).alias("e")
        )
        .select(F.col("e.key").alias("key"), F.col("e.value").alias("value"))
    )
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.count(
                F.when(F.expr("try_cast(value AS DOUBLE)").isNotNull(), 1)
            ).alias("n_numeric"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .join(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(F.expr("CAST(n_present AS DOUBLE) / CAST(_n AS DOUBLE)"), decimals).alias(
                "present_rate"
            ),
            "n_numeric",
            "n_distinct",
            "min_value",
            "max_value",
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier tuple
    (Sweeney 2002; Machanavajjhala 2007): group rows by the QI columns
    into equivalence classes, then roll classes up BY CLASS SIZE so the
    re-identification risk profile of a 100 TB table compresses to a
    few dozen rows.

    Output per distinct class size: ``class_size``, ``n_classes``,
    ``n_rows``, ``at_risk`` (size < k — these rows are re-identifiable
    below the k bar), ``min_l`` / ``max_l`` (distinct sensitive values
    per class — l-diversity; min_l = 1 means an attacker who locates
    the class learns the sensitive value outright), and ``row_share``
    of the table. Counts are exact BIGINTs; the share is one division
    ROUNDed once.

    Scale: two shuffles, both shrinking — QI groupBy (map-side
    combined, carries one row per class) then size groupBy (carries
    one row per distinct size). The exact per-class distinct uses the
    count-distinct expand inside the first agg; at 100 TB swap to
    ``approx_count_distinct`` with the same output schema.

    No reference analog (morphik-core's governance is per-row ACLs,
    `core/models/auth.py`); this is the corpus-release gate that sits
    beside `pii_scrub` in a training-data pipeline.
    """
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("_size"),
        F.countDistinct(F.col(sensitive_col)).alias("_l"),
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        classes.groupBy(F.col("_size").alias("class_size"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("_size").alias("n_rows"),
            F.min("_l").alias("min_l"),
            F.max("_l").alias("max_l"),
        )
        .join(F.broadcast(total))
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            (F.col("class_size") < F.lit(k)).alias("at_risk"),
            "min_l",
            "max_l",
            F.round(
                F.expr("CAST(n_rows AS DOUBLE) / CAST(_n AS DOUBLE)"), decimals
            ).alias("row_share"),
        )
    )


# log10(1 + 1/d) for d = 1..9, written as full-precision double literals
# so Spark and any oracle engine use the IDENTICAL constant (no runtime
# log10 call whose last ulp could differ between libm implementations).
BENFORD_EXPECTED = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law per group —
    the classic fabricated-data / corruption screen for financial and
    telemetry columns (Nigrini 2012). Values <= 0 or NULL are excluded
    (Benford applies to positive magnitudes).

    The first significant digit is taken LEXICALLY — first char of the
    decimal rendering of ``abs(value)`` with leading "0."/zeros
    stripped — which is exact for DECIMAL columns and avoids any
    log/pow float path entirely. Expected shares are compile-time
    double literals (``BENFORD_EXPECTED``), observed shares one
    division of exact BIGINTs; ``abs_dev`` is one fixed ROUND tree.

    Output: group_cols + (digit, n, observed, expected, abs_dev).
    Groups missing a digit entirely still emit its row (n=0) via a
    broadcast digit spine, so the downstream MAD-over-digits screen
    (flag when mean |obs-exp| > 0.015) always averages over 9 terms.

    Scale: one groupBy(group, digit) with map-side combine — the
    shuffle carries at most 9 rows per group; the digit spine is a
    9-row broadcast. No reference analog (extension; sits with the
    validation suite).
    """
    spark = df.sparkSession
    gcols = [F.col(c) for c in group_cols]
    digit = F.regexp_extract(
        F.regexp_replace(
            F.abs(F.col(value_col)).cast("string"), r"^0\.0*", ""
        ),
        r"([1-9])",
        1,
    )
    counted = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .groupBy(*gcols, digit.cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    groups = counted.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum("n").alias("_total")
    )
    from morphik_core_spark.plans.literal import values_literal_frame

    spine = values_literal_frame(
        spark,
        [("digit", "int"), ("expected", "double")],
        [(d, e) for d, e in BENFORD_EXPECTED.items()],
    )
    return (
        groups.join(F.broadcast(spine))
        .join(counted, [*group_cols, "digit"], "left")
        .select(
            *[F.col(c) for c in group_cols],
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(
                F.expr("CAST(COALESCE(n, 0) AS DOUBLE) / CAST(_total AS DOUBLE)"),
                decimals,
            ).alias("observed"),
            F.round(F.col("expected"), decimals).alias("expected"),
            F.round(
                F.abs(
                    F.expr("CAST(COALESCE(n, 0) AS DOUBLE) / CAST(_total AS DOUBLE)")
                    - F.col("expected")
                ),
                decimals,
            ).alias("abs_dev"),
        )
    )


def l_diversity_classes(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
    entity_col: str | None = None,
) -> DataFrame:
    """Per-equivalence-class l-diversity detail — the remediation
    complement of :func:`k_anonymity_audit`'s size-rollup: one row per
    distinct quasi-identifier tuple with its size, its count of
    distinct sensitive values (``l_div``), and a ``violates_l`` flag
    (Machanavajjhala 2007: a class with fewer than l distinct
    sensitive values lets an attacker who locates the class infer the
    sensitive attribute with high confidence).

    ``entity_col`` counts class size in distinct entities (e.g.
    customers) rather than rows, for fact tables where one entity
    contributes many rows.

    One shuffle (QI groupBy, map-side combined, one row out per class);
    at 100 TB the distinct-count pair inside the agg swaps to
    ``approx_count_distinct`` with the same schema. Output is
    class-grained — bounded by the QI cardinality, not the row count.
    """
    size_expr = (
        F.countDistinct(F.col(entity_col)) if entity_col else F.count(F.lit(1))
    ).alias("class_size")
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(size_expr, F.countDistinct(F.col(sensitive_col)).alias("l_div"))
        .withColumn("violates_l", F.col("l_div") < F.lit(l))
    )


def t_closeness_classes(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    t_num: int = 3,
    t_den: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Per-equivalence-class t-closeness (Li, Li, Venkatasubramanian
    2007) — the third rung of the privacy ladder after
    :func:`k_anonymity_audit` and :func:`l_diversity_classes`: a class
    can be large (k-safe) and diverse (l-safe) yet still leak when its
    sensitive-value DISTRIBUTION skews far from the table's. Distance
    is total variation ``tvd = ½·Σ_s |p_class(s) − p_global(s)|`` (the
    categorical Earth Mover's distance under the discrete metric).

    Exactness: the numerator is the exact integer ``Σ_s |n_cs·N −
    n_gs·n_c|`` and the ``violates_t`` flag compares ``num·t_den >
    t_num·2·n_c·N`` in pure int64 — the threshold never touches a
    float (products stay exact while n_c·N ≤ 2^63; past that, the same
    tree in DECIMAL). ``tvd`` itself is ROUNDed once for display.

    Scale: one class×sensitive groupBy (map-side combined), then the
    class table cross-joins only the VOCABULARY-sized global
    distribution (broadcast) so absent values count as 0. Output is
    class-grained.
    """
    qi = list(qi_cols)
    cls = df.groupBy(*qi, F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_ncs")
    )
    csz = cls.groupBy(*qi).agg(F.sum("_ncs").alias("_nc"))
    g = df.groupBy(F.col(sensitive_col).alias("_s")).agg(F.count(F.lit(1)).alias("_ng"))
    tot = df.agg(F.count(F.lit(1)).alias("_nn"))
    full = (
        csz.crossJoin(F.broadcast(g))
        .join(cls, qi + ["_s"], "left")
        .withColumn("_ncs0", F.coalesce(F.col("_ncs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    agg = full.groupBy(*qi, "_nc", "_nn").agg(
        F.sum(F.abs(F.col("_ncs0") * F.col("_nn") - F.col("_ng") * F.col("_nc"))).alias("_num")
    )
    return agg.select(
        *qi,
        F.col("_nc").alias("class_size"),
        F.round(
            F.col("_num").cast("double") / (2.0 * F.col("_nc") * F.col("_nn")), decimals
        ).alias("tvd"),
        (F.col("_num") * t_den > F.lit(2 * t_num) * F.col("_nc") * F.col("_nn")).alias(
            "violates_t"
        ),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 0,
    decimals: int = 6,
) -> DataFrame:
    """Epsilon-differentially-private noisy counts via the Laplace
    mechanism -- the RELEASE step after the k-anonymity -> l-diversity
    -> t-closeness audit ladder says a grouping is safe to publish:
    each group count gets Laplace(1/eps) noise (count queries have
    sensitivity 1), the calibrated-noise mechanism of Dwork et al. 2006.

    The noise is DETERMINISTIC given (group, seed) -- the repo's
    randomized-operator convention so an oracle can replay it: u =
    (portable_hash(group, seed) mod 2^30 + 0.5)/2^30 is an exact double
    in (0,1) (half-integers over a power of two; the +0.5 keeps the
    inverse CDF away from ln(0) at both ends), then

        noise = (1/eps) * ln(2u)          if u < 0.5
              = -(1/eps) * ln(2 - 2u)     if u >= 0.5

    quantized ROUND(*1e6) before adding. One map-side-combined groupBy;
    everything after is per-row arithmetic on the groups frame.

    Output per group: (group_cols..., n_true, noise, n_noisy). A real
    DP release drops ``n_true`` (and ``noise``) -- they are emitted
    here so tests and the parity oracle can audit the mechanism; the
    privacy accounting story is the caller's.
    """
    eps = float(epsilon)
    if eps <= 0:
        raise ValueError("epsilon must be positive")
    counts = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in group_cols], F.lit(str(int(seed)))
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    u = "((CAST(_h % 1073741824 AS DOUBLE) + 0.5) / 1073741824.0)"
    noise_u = (
        f"CAST(ROUND(CASE WHEN {u} < 0.5 THEN ln(2.0 * {u}) / {eps!r} "
        f"ELSE -(ln(2.0 - 2.0 * {u}) / {eps!r}) END * 1e6) AS BIGINT)"
    )
    return (
        counts.withColumn("_h", h)
        .withColumn("_nz", F.expr(noise_u))
        .select(
            *group_cols,
            F.col("n_true").cast("bigint").alias("n_true"),
            F.round(F.col("_nz").cast("double") / F.lit(1e6), decimals).alias("noise"),
            (
                F.col("n_true")
                + F.expr("CAST(ROUND(CAST(_nz AS DOUBLE) / 1e6) AS BIGINT)")
            ).alias("n_noisy"),
        )
        .orderBy(*group_cols)
    )


def schema_drift(
    old: DataFrame,
    new: DataFrame,
    json_col: str,
    min_rate_delta: float = 0.05,
    decimals: int = 6,
) -> DataFrame:
    """Schema drift between two snapshots of a semi-structured column —
    the change-detection layer on top of `json_schema_profile`'s
    single-snapshot inference: which JSON keys APPEARED, VANISHED,
    changed their presence rate materially, or flipped their inferred
    type (numeric↔string). This is the alert a 100 TB ingestion
    pipeline raises when an upstream producer silently changes its
    payload shape.

    Per key: presence rates on both sides (exact integer counts, one
    ROUND each), the numeric-share-based type verdicts
    (numeric iff >50% of present values try_cast to DOUBLE — the
    profiler's promotion rule), and a status:

        added | removed | type_changed | rate_shift | stable

    rate_shift fires when |rate_new − rate_old| ≥ ``min_rate_delta``
    via an exact integer-micro comparison. Two profile aggregations
    (each one explode + one groupBy, key-bounded) and a key-grain full
    outer join — nothing corpus-sized past the profiles.

    Output per key: (key, n_old, n_new, rate_old, rate_new, type_old,
    type_new, status), ordered by status then key.
    """

    def profile(df: DataFrame, tag: str):
        total = df.agg(
            F.count(F.when(F.col(json_col).isNotNull(), 1)).alias(f"_n_{tag}")
        )
        kv = (
            df.filter(F.col(json_col).isNotNull())
            .select(
                F.explode(
                    F.map_entries(F.from_json(F.col(json_col), "map<string,string>"))
                ).alias("e")
            )
            .select(F.col("e.key").alias("key"), F.col("e.value").alias("value"))
        )
        return (
            kv.groupBy("key")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.count(
                    F.when(F.expr("try_cast(value AS DOUBLE)").isNotNull(), 1)
                ).alias(f"_num_{tag}"),
            )
            .join(F.broadcast(total))
        )

    po = profile(old, "old")
    pn = profile(new, "new")
    j = po.join(pn, "key", "full")
    rate = lambda t: F.round(
        F.expr(f"CAST(n_{t} AS DOUBLE) / CAST(_n_{t} AS DOUBLE)"), decimals
    )
    # type verdict: numeric iff strictly more than half the present
    # values cast — exact integer compare
    typ = lambda t: F.when(
        F.col(f"n_{t}").isNull(), F.lit(None).cast("string")
    ).when(F.expr(f"2 * _num_{t} > n_{t}"), F.lit("numeric")).otherwise(F.lit("string"))
    thr = int(round(float(min_rate_delta) * 1_000_000))
    rmicro = lambda t: F.expr(
        f"CAST(ROUND(CAST(n_{t} AS DOUBLE) / CAST(_n_{t} AS DOUBLE) * 1e6) AS BIGINT)"
    )
    out = j.select(
        "key",
        F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        F.when(F.col("n_old").isNotNull(), rate("old")).alias("rate_old"),
        F.when(F.col("n_new").isNotNull(), rate("new")).alias("rate_new"),
        typ("old").alias("type_old"),
        typ("new").alias("type_new"),
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .when(typ("old") != typ("new"), F.lit("type_changed"))
        .when(
            F.abs(rmicro("new") - rmicro("old")) >= thr, F.lit("rate_shift")
        )
        .otherwise(F.lit("stable"))
        .alias("status"),
    )
    return out.orderBy("status", "key")


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation of two snapshots of the same table:
    per key, is the row ``added`` (B only), ``removed`` (A only),
    ``changed`` (present in both, any compared column differs), or
    ``unchanged`` — with the NAMES of the differing columns. The audit
    primitive every migration/backfill/CDC pipeline runs before
    trusting a cutover (`plans/migration` flips stores; this is the
    check that the flip lost nothing), and the row-level complement of
    `schema_drift`'s column-profile view.

    Semantics: column comparison is NULL-safe (``IS DISTINCT FROM`` —
    NULL vs NULL is unchanged, NULL vs value is a change).
    ``changed_cols`` lists differing columns in declaration order;
    empty for added/removed/unchanged.

    Scale: ONE full-outer shuffle join on the keys — both sides can be
    100 TB; everything else is per-row expressions. Aggregate on top
    for the audit rollup (the `snapshot_diff` query's shape).

    Output: (keys..., change_type, changed_cols array<string>).
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in keys and c in b.columns]
    compare_cols = list(compare_cols)
    la = a.select(
        *[F.col(k).alias(f"_ka_{k}") for k in keys],
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
        F.lit(1).alias("_in_a"),
    )
    lb = b.select(
        *[F.col(k).alias(f"_kb_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
        F.lit(1).alias("_in_b"),
    )
    cond = None
    for k in keys:
        eq = la[f"_ka_{k}"].eqNullSafe(lb[f"_kb_{k}"])
        cond = eq if cond is None else (cond & eq)
    j = la.join(lb, cond, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    change = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_ka_{k}"), F.col(f"_kb_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        F.when(
            F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull(), diffs
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )
