"""Sessionization — gap-based event sessions (batch + streaming forms).

The reference has no stream processing (SURVEY §2.9); this is a
Spark-native extension for the events/training-telemetry side of the
pipeline. Batch form is the classic lag→gap→cumsum window chain, fully
oracle-expressible; the streaming twin is ``session_window`` /
``applyInPandasWithState`` over the same schema.

Scale: one shuffle (partition by user), sorted within partitions; the
window functions pipeline in a single pass — no iterative logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "streaming_session_counts",
    "time_bucket_gapfill",
    "moving_aggregates",
    "change_intervals",
    "debounce_events",
    "keep_first_per_window",
    "session_paths",
]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a session_id per (user, burst-of-activity).

    A new session starts when the gap from the previous event exceeds
    ``gap_seconds``. session_id is the per-user session ordinal (0-based).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w) - 1
    ).drop("_new")


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: event count + duration seconds."""
    s = sessionize(events, gap_seconds, user_col, ts_col, order_tiebreak)
    # duration stays in exact integer microseconds — callers derive seconds
    # with deterministic integer truncation (float rounding of µs/1e6 sits
    # on half-boundaries whenever µs ends in ...50)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias("duration_us"),
    )


def streaming_session_counts(
    stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin: ``session_window`` + watermark over an event stream.

    Gap semantics match the batch ``sessionize`` (a session closes after
    ``gap_seconds`` of inactivity), so on a finite backlog the per-session
    event counts agree with the batch form — asserted in tests.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), f"{gap_seconds} seconds"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def time_bucket_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_secs: int = 21600,
    decimals: int = 6,
) -> DataFrame:
    """Hypertable-style time_bucket_gapfill + LOCF (the TimescaleDB
    operator a telemetry rollup needs): bucket events per key, materialize
    EVERY bucket in the key's [min, max] span, and carry the last observed
    value forward across the gaps.

    Output: (key, bucket_ts, n_events, v_sum, v_locf) — gap rows have
    n_events=0 and NULL v_sum; v_locf is the last non-null (rounded)
    bucket sum at or before the row. Bucketing is integer µs floor
    division, exactly reproducible relationally.

    Plan shape: one groupBy on (key, bucket) (map-side combined), a tiny
    per-key range aggregate, sequence-explode for the grid (no driver
    loop), a left equi-join back, and one per-key ordered window for LOCF.
    The window partition is bounded by a key's bucket span, not corpus
    size — no global-sort hazard at 100 TB; keys are the shuffle unit.
    """
    us = bucket_secs * 1_000_000
    b = F.expr(f"unix_micros(`{ts_col}`) div {us}")
    agg = (
        events.select(F.col(key_col), b.alias("b"), F.col(value_col).alias("v"))
        .groupBy(key_col, "b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), decimals).alias("v_sum"),
        )
    )
    rng = agg.groupBy(key_col).agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    grid = rng.select(
        F.col(key_col), F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b")
    )
    joined = grid.join(agg, [key_col, "b"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.expr(f"timestamp_micros(b * {us})").alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.col("v_sum"),
        F.last("v_sum", ignorenulls=True).over(w).alias("v_locf"),
    )


def moving_aggregates(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    lookback_rows: int = 5,
    scale: int = 6,
) -> DataFrame:
    """Frame-spec sliding-window aggregates per key: for each event, the
    DECIMAL-exact sum plus min/max/count of ``value_col`` over the last
    ``lookback_rows`` rows (and itself), ordered by (ts, tiebreak).

    The reference has no frame windows (SURVEY §2.5) — this is the
    Spark-native extension for per-entity rolling features (rate limits,
    rolling spend, anomaly baselines). Output columns:
    (key, tiebreak, mov_sum, mov_min, mov_max, mov_cnt).

    Exactness: the sliding sum runs over DECIMAL(18, scale) — exact and
    associative, so segment-tree vs running-sum window implementations
    cannot disagree (a DOUBLE sliding sum is association-dependent and
    would break cross-engine parity). min/max/count are order-free.

    Scale: window partitions are per-key — bounded by a key's event
    count, never corpus size; the one shuffle is the key repartition.
    """
    dec = f"decimal(18,{scale})"
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-lookback_rows, Window.currentRow)
    )
    return events.select(
        F.col(key_col),
        F.col(tiebreak_col),
        F.sum(F.col(value_col).cast(dec)).over(w).cast(dec).alias("mov_sum"),
        F.min(value_col).over(w).alias("mov_min"),
        F.max(value_col).over(w).alias("mov_max"),
        F.count(F.lit(1)).over(w).alias("mov_cnt"),
    )


def change_intervals(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
) -> DataFrame:
    """SCD2-style history reconstruction (gaps-and-islands): collapse each
    key's event stream into intervals of unchanged state. Output:
    (key, state, valid_from, valid_to, n_events, is_current) — valid_to
    is the next interval's start (NULL on the open, current interval).

    This is the CDC pattern for rebuilding a slowly-changing dimension
    from an append-only change log — the warehouse twin of the
    reference's in-place Postgres row updates (`postgres_database.py`
    update_document): replaying the log yields full history instead of
    last-write-only. Islands come from the classic
    ``row_number() - row_number(per state)`` difference; all windows
    partition by key (bounded per entity, never corpus-wide).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    ws = Window.partitionBy(key_col, state_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    marked = events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(state_col),
        F.lead(ts_col).over(w).alias("next_ts"),
        (F.row_number().over(w) - F.row_number().over(ws)).alias("island"),
    )
    return (
        marked.groupBy(key_col, state_col, "island")
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.max("next_ts").alias("_max_next"),
            F.count(F.lit(1)).alias("n_events"),
            # the island holding the key's final event has one NULL lead
            (F.count(F.lit(1)) - F.count("next_ts")).alias("_open"),
        )
        .select(
            key_col,
            state_col,
            "valid_from",
            # interior leads are within-island: only the closing row's lead
            # is the next interval's start, and the open interval has none
            F.when(F.col("_open") > 0, F.lit(None)).otherwise(F.col("_max_next")).alias("valid_to"),
            "n_events",
            (F.col("_open") > 0).alias("is_current"),
        )
    )


def debounce_events(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    min_gap_secs: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Burst collapse: keep an event only when at least ``min_gap_secs``
    passed since the PREVIOUS event of the same key — the dedupe rule
    for retry storms / double-clicks / sensor chatter before events
    feed counts or sessionization.

    Semantics note: the gap is measured to the previous RAW event (one
    lag window over integer epoch-µs), not the previous KEPT event —
    the kept-event form needs sequential state (its streaming twin is
    exactly `applyInPandasWithState`-shaped) while this form stays one
    window pass, partitioning bounded per key. For bursts shorter than
    ``min_gap_secs`` both forms keep just the first event, which is the
    operational case; a steady sub-gap drizzle suppresses everything
    after the first under this rule (documented trade).

    Output: input rows + kept flag (callers filter) — keeping the flag
    makes suppression auditable, the same pattern as the curation
    filters. Ties on ts order by ``tiebreak_col`` so engines agree.
    """
    from pyspark.sql import Window

    order = [F.expr(f"unix_micros(`{ts_col}`)")]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    prev_us = F.lag(F.expr(f"unix_micros(`{ts_col}`)")).over(w)
    gap_ok = (
        prev_us.isNull()
        | ((F.expr(f"unix_micros(`{ts_col}`)") - prev_us) >= min_gap_secs * 1_000_000)
    )
    return events.withColumn("kept", gap_ok)


def keep_first_per_window(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    window_seconds: int,
) -> DataFrame:
    """Tumbling-window dedup: keep the FIRST event (earliest ts, min id
    tie-break) per (keys, aligned window) — "at most one event per user
    per hour", the rate-normalization every metrics pipeline applies
    before counting. Complements :func:`debounce_events` (that one
    suppresses by GAP from the previously-kept event; this one dedups
    within fixed epoch-aligned buckets) and is the batch twin of
    Structured Streaming's ``dropDuplicatesWithinWatermark``.

    Output: the kept rows with their window start (``window_start``,
    timestamp) and how many events the window held (``n_in_window`` —
    the suppression audit). Windows align to the epoch: bucket =
    unix_micros div width, exact integer arithmetic on any engine.

    Scale: one partitioned window (keys + bucket) — no global funnel,
    no join; the shuffle key includes the bucket so even a single hot
    user spreads across time.
    """
    width_us = int(window_seconds) * 1_000_000
    bucketed = events.withColumn(
        "_wb", F.expr(f"unix_micros(`{ts_col}`) div {width_us}")
    )
    w = Window.partitionBy(*key_cols, "_wb").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        bucketed.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_in_window", F.count(F.lit(1)).over(Window.partitionBy(*key_cols, "_wb")))
        .filter(F.col("_rn") == 1)
        .withColumn("window_start", F.expr(f"timestamp_micros(_wb * {width_us})"))
        .drop("_wb", "_rn")
    )


def session_paths(
    events: DataFrame,
    gap_seconds: int,
    path_len: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Top navigation paths: the first ``path_len`` event types of every
    gap-based session, concatenated with '>' — the clickstream-path
    report on top of :func:`sessionize` (what sequences do sessions
    start with, and how many users produce each).

    Output: (path, n_sessions, n_users). The in-session order is made
    total by the tie-break column, so the collected prefix is identical
    in any engine/partitioning; sessions shorter than ``path_len`` keep
    their (shorter) full path.

    Scale: sessionize's lag/cumsum windows partition by user; the
    collect_list aggregates per (user, session) — bounded by session
    length, never corpus-sized — and the final rollup shuffles one row
    per session.
    """
    s = sessionize(events, gap_seconds, user_col, ts_col, order_tiebreak)
    per_session = (
        s.groupBy(user_col, "session_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros(F.col(ts_col)).alias("us"),
                            F.col(order_tiebreak).alias("tb"),
                            F.col(type_col).alias("et"),
                        )
                    )
                ),
                1,
                path_len,
            ).alias("_prefix")
        )
        .select(
            user_col,
            F.expr("concat_ws('>', transform(_prefix, x -> x.et))").alias("path"),
        )
    )
    return per_session.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct(user_col).alias("n_users"),
    )
