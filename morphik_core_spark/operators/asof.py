"""As-of joins — the video time-series ``at_time`` lookup, generalized.

Reference semantics (/root/reference/core/models/video.py:41-85):
- ``at_time(t)``: nearest timestamp by binary search; EXACT tie between
  the before/after candidates resolves to the EARLIER one
  (``idx if (t - before) > (after - t) else idx - 1``)
- ``at_time(t, padding)``: entries between nearest(clamp(t-p)) and
  nearest(clamp(t+p)) inclusive (bounds clamped to the series range)

Spark form: candidate aggregation — per probe, the latest series row at or
before t and the earliest after t, then a distance pick. Both candidate
joins are key-equi joins with a range predicate; Catalyst executes them as
hash joins on the key with the range as a post-filter, and both aggregates
partial map-side. No window over the full series is required, so the
series table never globally sorts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "asof_backward",
    "asof_forward",
    "asof_nearest",
    "at_time_padding",
    "interval_point_join",
    "pit_join",
    "interval_overlap_pairs",
    "peak_concurrency",
    "interval_islands",
]


def _us(col: Column) -> Column:
    return F.unix_micros(col)


def asof_backward(
    probes: DataFrame,
    series: DataFrame,
    key: str,
    probe_ts: str = "ts",
    series_ts: str = "ts",
    probe_id: str = "event_id",
) -> DataFrame:
    """Classic as-of: most recent series row at or before each probe.

    Returns probe columns + matched_ts (NULL when no series row precedes).
    """
    return _asof_directional(
        probes, series, key, probe_ts, series_ts, probe_id, direction="backward"
    )


def asof_forward(
    probes: DataFrame,
    series: DataFrame,
    key: str,
    probe_ts: str = "ts",
    series_ts: str = "ts",
    probe_id: str = "event_id",
) -> DataFrame:
    """Forward as-of: earliest series row at or after each probe — the
    mirror of :func:`asof_backward` (pandas merge_asof direction=
    'forward'); completes the backward/forward/nearest family.

    Returns probe columns + matched_ts (NULL when nothing follows).
    """
    return _asof_directional(
        probes, series, key, probe_ts, series_ts, probe_id, direction="forward"
    )


def _asof_directional(
    probes: DataFrame,
    series: DataFrame,
    key: str,
    probe_ts: str,
    series_ts: str,
    probe_id: str,
    direction: str,
) -> DataFrame:
    """Union-tag-window as-of — the form that survives 100 TB.

    The join+groupBy restatement (`p ⋈ s ON key AND s.ts <= p.ts` then
    max) materializes a per-key cross product before aggregating: a key
    with P probes and S series rows emits P×S join rows, which detonates
    on dense keys. Here probes and series union into one stream, sort
    once per key by (ts, series-first-on-tie), and a running
    last/first-ignorenulls window picks each probe's match — one
    shuffle + sort, O(P+S) rows per key, the same shape a streaming
    state-store implementation walks. Tie rule: a series row AT the
    probe's timestamp sorts before (backward) / after (forward) the
    probe, preserving the <= / >= semantics of the join form
    (equivalence-tested row-for-row in tests/test_asof_docstore.py).
    """
    from pyspark.sql import Window

    backward = direction == "backward"
    # probe payload rides the single sort as a struct (NULL on series
    # rows) — restoring it after the window costs nothing, while the
    # old `probes.join(matched, probe_id)` join-back added a second
    # shuffle + a re-scan of the probe input (measured 2.7x on the
    # sf0.1 bench, and at scale it doubles the largest exchange)
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_t"),
        F.lit(0).alias("_is_s"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("_prow"),
    )
    s = series.select(
        F.col(key).alias("_k"),
        F.col(series_ts).alias("_t"),
        F.lit(1).alias("_is_s"),
        F.lit(None).cast(probes.schema).alias("_prow"),
    )
    tagged = p.unionByName(s)
    if backward:
        # series row at equal ts comes first -> included (<= semantics)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_s").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last(F.when(F.col("_is_s") == 1, F.col("_t")), ignorenulls=True)
    else:
        # ascending scan with a FOLLOWING frame; series at equal ts sorts
        # after the probe -> included (>= semantics)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_s").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first(F.when(F.col("_is_s") == 1, F.col("_t")), ignorenulls=True)
    return (
        tagged.withColumn("matched_ts", pick.over(w))
        .filter(F.col("_is_s") == 0)
        .select("_prow.*", "matched_ts")
    )


def asof_nearest(
    probes: DataFrame,
    series: DataFrame,
    key: str,
    probe_ts: str = "ts",
    series_ts: str = "ts",
    probe_id: str = "event_id",
) -> DataFrame:
    """Nearest-timestamp as-of with the reference's earlier-on-tie rule.

    Returns probe columns + matched_ts (NULL when the series is empty for
    the key).
    """
    from pyspark.sql import Window

    # Same union-tag-window shape as _asof_directional, but BOTH
    # directions read off ONE sort: with series-first-on-tie ordering,
    # the PRECEDING frame sees series rows <= the probe's ts and the
    # FOLLOWING frame sees strictly > — exactly the reference's
    # before/after candidate split (video.py:55-85). Two frames over the
    # same (partition, order) reuse the single shuffle+sort; the old
    # form joined the fact against the series twice.
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_t"),
        F.lit(0).alias("_is_s"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("_prow"),
    )
    s = series.select(
        F.col(key).alias("_k"),
        F.col(series_ts).alias("_t"),
        F.lit(1).alias("_is_s"),
        F.lit(None).cast(probes.schema).alias("_prow"),
    )
    order = [F.col("_t").asc(), F.col("_is_s").desc()]
    w_before = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_after = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    series_t = F.when(F.col("_is_s") == 1, F.col("_t"))
    matched = (
        p.unionByName(s)
        .withColumn("bts", F.last(series_t, ignorenulls=True).over(w_before))
        .withColumn("ats", F.first(series_t, ignorenulls=True).over(w_after))
        .filter(F.col("_is_s") == 0)
    )
    t, b, a = F.col("_t"), F.col("bts"), F.col("ats")
    nearest = (
        F.when(b.isNull(), a)
        .when(a.isNull(), b)
        .when((_us(t) - _us(b)) > (_us(a) - _us(t)), a)
        .otherwise(b)  # ties -> earlier, per reference
    )
    # probe payload was carried through the sort as _prow (see
    # _asof_directional) — no join-back, one shuffle total
    return matched.select("_prow.*", nearest.alias("matched_ts"))


def at_time_padding(
    probes: DataFrame,
    series: DataFrame,
    key: str,
    padding_seconds: float,
    probe_ts: str = "ts",
    series_ts: str = "ts",
    probe_id: str = "event_id",
) -> DataFrame:
    """Windowed lookup: series rows between the nearest-of-clamped bounds.

    Output: (probe_id, series rows within the resolved window), matching
    at_time(t, padding)'s inclusive index-range semantics.
    """
    pad = F.expr(f"INTERVAL {int(padding_seconds)} SECONDS")
    bounds = (
        series.groupBy(key)
        .agg(F.min(series_ts).alias("first_ts"), F.max(series_ts).alias("last_ts"))
    )
    p2 = (
        probes.join(bounds, key)
        .withColumn("start_t", F.greatest(F.col(probe_ts) - pad, F.col("first_ts")))
        .withColumn("end_t", F.least(F.col(probe_ts) + pad, F.col("last_ts")))
    )
    start_near = asof_nearest(
        p2.select(probe_id, key, F.col("start_t").alias("ts")), series, key, "ts", series_ts, probe_id
    ).select(probe_id, F.col("matched_ts").alias("win_start"))
    end_near = asof_nearest(
        p2.select(probe_id, key, F.col("end_t").alias("ts")), series, key, "ts", series_ts, probe_id
    ).select(probe_id, F.col("matched_ts").alias("win_end"))

    windowed = p2.join(start_near, probe_id).join(end_near, probe_id)
    s = series.alias("s")
    return (
        windowed.alias("w")
        .join(
            s,
            (F.col(f"w.{key}") == F.col(f"s.{key}"))
            & (F.col(f"s.{series_ts}") >= F.col("w.win_start"))
            & (F.col(f"s.{series_ts}") <= F.col("w.win_end")),
        )
        .select(F.col(f"w.{probe_id}").alias(probe_id), F.col(f"s.{series_ts}").alias("matched_ts"))
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int = 32,
) -> DataFrame:
    """Point-in-interval join via bucket decomposition — the equi-join
    restatement of ``p BETWEEN lo AND hi`` that survives big×big inputs.

    Spark has no native range join; a raw theta join compiles to
    BroadcastNestedLoopJoin (driver-bound) or a cartesian shuffle. The
    classic fix (Trino/Databricks range-join hints do the same under the
    hood): quantize the point axis into fixed-width buckets, explode each
    interval into the buckets it covers, map each point to its single
    bucket, equi-join on the bucket id, then re-apply the exact range
    predicate as a residual filter. Per-interval fan-out is
    ``len/width + 1`` rows, so for bounded interval lengths the plan is a
    plain hash equi-join shuffle — both sides can be 100 TB.

    ``point_col``/``lo_col``/``hi_col`` must already be integers on a
    shared axis (day numbers, epoch seconds, ids); keeping the axis
    integral keeps the bucket arithmetic and the residual compare exact
    on every engine. Inclusive on both ends, NULL bounds never match.

    Returns all points columns + all intervals columns (inner join;
    aggregate on top). Pick ``bucket_width`` ≈ the typical interval
    length: smaller → more fan-out rows, larger → more residual misses.
    """
    def _floor_bucket(c):
        c = c.cast("long")
        return c - F.pmod(c, F.lit(bucket_width))

    p = points.withColumn("_b", _floor_bucket(F.col(point_col)))
    # Degenerate-interval guard: BETWEEN simply matches nothing when
    # hi < lo or a bound is NULL, but F.sequence(floor(lo), floor(hi), +w)
    # throws "illegal sequence boundaries" at runtime — one corrupt row
    # must not kill a 100 TB job. Filter those rows out first; this is the
    # exact set BETWEEN would drop anyway, so semantics are unchanged.
    i = (
        intervals.filter(F.col(lo_col).isNotNull() & (F.col(lo_col) <= F.col(hi_col)))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    _floor_bucket(F.col(lo_col)),
                    _floor_bucket(F.col(hi_col)),
                    F.lit(bucket_width),
                )
            ),
        )
    )
    return (
        p.join(i, on="_b", how="inner")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_b")
    )


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int = 32,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Interval×interval self overlap join — all unordered pairs whose
    ``[lo, hi]`` ranges intersect — via the same bucket decomposition as
    :func:`interval_point_join`, extended to two exploded sides.

    Both intervals explode into the fixed-width buckets they cover and
    the pair materializes once per SHARED bucket; the count-once rule
    keeps only the bucket containing ``greatest(lo_a, lo_b)`` (every
    overlapping pair shares exactly that bucket, because the later
    start lies inside the earlier interval), so no post-hoc distinct
    over an O(len/width) duplicate fan-out is needed. The join is a
    plain hash equi-join on ``(key_cols…, bucket)``; for bounded
    interval lengths per-row fan-out is ``len/width + 1`` and both
    sides can be 100 TB. Malformed (``hi < lo`` / NULL-bound) rows are
    dropped up front — the exact set the overlap predicate would never
    match — so one corrupt row cannot kill the job via
    ``F.sequence``'s boundary check.

    ``lo``/``hi`` must be integers on a shared axis (day numbers,
    epoch seconds); inclusive ends; overlap means ``lo_a <= hi_b AND
    lo_b <= hi_a``. Output: ``key_cols…, id_a, id_b, lo_a, hi_a,
    lo_b, hi_b`` with ``id_a < id_b``.

    No reference analog (morphik-core has only the point-lookup
    ``at_time``, core/models/video.py:41-85); this is the
    concurrent-validity join a temporal pipeline needs (overlapping
    sessions, double-booked resources, SCD2 sanity).
    """
    def _floor_bucket(c):
        c = c.cast("long")
        return c - F.pmod(c, F.lit(bucket_width))

    keys = list(key_cols)
    exploded = (
        df.filter(F.col(lo_col).isNotNull() & (F.col(lo_col) <= F.col(hi_col)))
        .select(
            *keys,
            F.col(id_col).alias("_id"),
            F.col(lo_col).cast("long").alias("_lo"),
            F.col(hi_col).cast("long").alias("_hi"),
        )
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    _floor_bucket(F.col("_lo")),
                    _floor_bucket(F.col("_hi")),
                    F.lit(bucket_width),
                )
            ),
        )
    )
    a = exploded.select(
        *keys, "_b",
        F.col("_id").alias("id_a"), F.col("_lo").alias("lo_a"), F.col("_hi").alias("hi_a"),
    )
    b = exploded.select(
        *[F.col(k).alias(f"_r_{k}") for k in keys], F.col("_b").alias("_r_b"),
        F.col("_id").alias("id_b"), F.col("_lo").alias("lo_b"), F.col("_hi").alias("hi_b"),
    )
    cond = (F.col("_b") == F.col("_r_b")) & (F.col("id_a") < F.col("id_b"))
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    later_start = F.greatest(F.col("lo_a"), F.col("lo_b"))
    return (
        a.join(b, cond)
        .filter(
            (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a"))
            & (F.col("_b") == later_start - F.pmod(later_start, F.lit(bucket_width)))
        )
        .select(*keys, "id_a", "id_b", "lo_a", "hi_a", "lo_b", "hi_b")
    )


def peak_concurrency(
    df: DataFrame,
    key_cols: Sequence[str],
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Per-key maximum number of simultaneously-open ``[lo, hi]``
    intervals, and the earliest axis point where that peak holds — the
    sweep-line restatement of "max concurrent sessions / double-booked
    capacity" that never materializes pairs (the pair join answers WHO
    overlaps; this answers HOW MANY, in O(n) rows).

    Each interval emits +1 at ``lo`` and −1 at ``hi + 1`` (inclusive
    ends); deltas net per (key, point) — integers, so partial
    aggregation order is irrelevant — then one running-sum window per
    key walks the swept axis and a (count DESC, point ASC) row_number
    picks the peak deterministically. Two shuffles, both on the key;
    window state is O(1). Malformed (hi < lo / NULL) intervals are
    dropped, matching :func:`interval_overlap_pairs`.

    Output: ``key_cols…, peak`` (int), ``peak_at`` (first axis point
    at peak). Axis must be integral, like the other interval ops.
    """
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    ok = df.filter(F.col(lo_col).isNotNull() & (F.col(lo_col) <= F.col(hi_col)))
    ev = ok.select(
        *keys, F.col(lo_col).cast("long").alias("_d"), F.lit(1).alias("_delta")
    ).unionByName(
        ok.select(
            *keys, (F.col(hi_col).cast("long") + 1).alias("_d"), F.lit(-1).alias("_delta")
        )
    )
    net = ev.groupBy(*key_cols, "_d").agg(F.sum("_delta").alias("_nd"))
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_pick = Window.partitionBy(*key_cols).orderBy(F.col("_c").desc(), F.col("_d").asc())
    return (
        net.withColumn("_c", F.sum("_nd").over(w_cum))
        .withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(*key_cols, F.col("_c").cast("int").alias("peak"), F.col("_d").alias("peak_at"))
    )


def interval_islands(
    df: DataFrame,
    key_cols: Sequence[str],
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Gaps-and-islands: merge each key's overlapping/touching ``[lo,
    hi]`` intervals into maximal covered spans — the third member of
    the interval family (pairs = WHO overlaps, peak = HOW MANY at once,
    islands = the MERGED coverage itself; SCD2 compaction, busy-period
    extraction, downtime stitching).

    Classic two-window form, one shuffle total: per key in (lo, hi)
    order, an interval STARTS an island iff its lo exceeds the running
    max of all earlier his (ROWS … 1 PRECEDING); the cumulative sum of
    those break flags is the island id; one groupBy rolls islands up.
    All integer comparisons — rows tying on (lo, hi) are
    interchangeable, so island GROUPS are deterministic even though
    their scan order isn't. Malformed rows dropped as in the sibling
    ops. Output: ``key_cols…, island_start, island_end, n_intervals``.
    """
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    ok = df.filter(F.col(lo_col).isNotNull() & (F.col(lo_col) <= F.col(hi_col))).select(
        *keys, F.col(lo_col).cast("long").alias("_lo"), F.col(hi_col).cast("long").alias("_hi")
    )
    order = [F.col("_lo").asc(), F.col("_hi").asc()]
    w_prev = (
        Window.partitionBy(*key_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(*key_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ok.withColumn(
        "_brk",
        (F.col("_lo") > F.coalesce(F.max("_hi").over(w_prev), F.lit(-(1 << 62)))).cast("int"),
    ).withColumn("_iid", F.sum("_brk").over(w_cum))
    return flagged.groupBy(*key_cols, "_iid").agg(
        F.min("_lo").alias("island_start"),
        F.max("_hi").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("_iid")


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join of a fact stream to an SCD2 dimension: each
    fact row picks the dimension version whose validity interval
    contains its timestamp (``from ≤ ts < to``, open ``to`` = NULL for
    the current version) — the warehouse consumer of
    `sessions.change_intervals`' history reconstruction, and the
    interval-table sibling of `asof_join_backward` (as-of joins pick
    the nearest event; PIT joins pick the CONTAINING version, which is
    the correctness contract for "what did the dimension say when this
    fact happened").

    Plan shape: Catalyst extracts the key equality as the join key and
    applies the interval predicate as a post-join filter, so this is a
    plain shuffled (or AQE-broadcast) equi-join on ``key_col`` — never
    a cartesian. Versions per key are history-bounded (the SCD2
    invariant: non-overlapping intervals), so the per-key fan-out is
    small and at most ONE version survives the filter per fact. For
    KEYLESS containment (no entity to equi-join on) use
    :func:`interval_point_join`'s bucket decomposition instead.
    """
    d = dim.select(
        F.col(key_col).alias("_dk"),
        F.col(from_col).alias("_from"),
        F.col(to_col).alias("_to"),
        *[
            F.col(c)
            for c in dim.columns
            if c not in (key_col, from_col, to_col)
        ],
    )
    cond = (
        (facts[key_col] == d["_dk"])
        & (facts[ts_col] >= d["_from"])
        & (d["_to"].isNull() | (facts[ts_col] < d["_to"]))
    )
    return facts.join(d, cond, how).drop("_dk", "_from", "_to")
