"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stream engine (SURVEY §2.9); this provides the
custom-state capability a 100 TB ingestion/telemetry pipeline needs when
``session_window``/watermark aggregates can't express the logic — e.g.
running per-document ingestion progress, or per-user running counters.

``running_counter_stream`` keeps (count, sum) per key in GroupState and
emits one snapshot row per key per micro-batch; state persists across
micro-batches (and restarts) via the checkpoint.

Note on timeouts: ``ProcessingTimeTimeout`` keeps scheduling micro-batches
to fire expirations, which prevents ``Trigger.AvailableNow`` runs from
ever terminating — use it only with continuous processing-time triggers;
batch-parity pipelines use ``NoTimeout`` (as here).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "running_counter_stream",
    "gap_session_stream",
    "dedup_stream",
    "dedup_docs_stream",
    "asof_backward_stream",
    "debounce_stream",
    "cusum_stream",
    "hampel_stream",
    "hll_stream",
    "hll_stream_estimates",
    "funnel_stream",
    "funnel_stream_counts",
    "holt_stream",
    "ewma_stream",
    "jsd_stream",
    "quantile_stream",
    "centroid_drift_stream",
    "w1_drift_stream",
    "psi_drift_stream",
    "mk_trend_stream",
    "page_hinkley_stream",
]

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": user_id, "n_events": n, "total_value": total}])


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def gap_session_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom-state gap sessionizer: emits each CLOSED session as one row
    (user_id, session_start, session_end, n_events).

    The logic ``session_window`` can't express: a session closes exactly
    when a later event arrives past the gap — so the open session rides
    in GroupState (start, last-seen, count in integer µs) and closed
    sessions stream out as they are sealed. Equivalence with the batch
    operator (operators/sessions.sessionize) is test-asserted: the closed
    sessions here match the batch sessions minus each user's final (still
    open) one. NoTimeout per the module note — AvailableNow-compatible;
    a deployment wanting idle-user expiry adds EventTimeTimeout plus a
    watermark on a continuous trigger.
    """

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        gap_us = gap_seconds * 1_000_000
        closed: list[tuple] = []
        for pdf in batches:
            # normalize to integer µs regardless of pandas datetime unit
            ts_us = np.sort(pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64"))
            for t in ts_us:
                t = int(t)
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        out = pd.DataFrame(closed, columns=["user_id", "session_start", "session_end", "n_events"])
        if not out.empty:
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counter_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, value, ...) → running per-user totals.

    One state row per user; output appends a snapshot per micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUTPUT_SCHEMA = "event_id bigint, user_id bigint, matched_ts timestamp"
ASOF_STATE_SCHEMA = "last_series_us bigint"


def asof_backward_stream(tagged: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming twin of the batch backward as-of join
    (operators/asof.asof_backward): one interleaved stream of probe and
    series rows per key — columns (key, ts, is_series, event_id) — emits
    one row per PROBE carrying the most recent series timestamp at or
    before it. The state is exactly what the batch union-tag-window form
    carries through its running ``last(...ignorenulls)``: ONE bigint (the
    latest series µs seen) per key.

    Within each micro-batch rows are sorted by (ts, series-first-on-tie),
    so in-batch disorder repairs itself and a series row AT a probe's
    timestamp matches it (the batch <= rule). Across micro-batches the
    operator is correct under per-key event-time-ordered arrival — the
    log-stream contract; a series row arriving AFTER a later probe was
    already emitted cannot retro-match it (append mode has no
    retraction). Equivalence with the batch operator under ordered
    feeds is test-asserted across a checkpoint restart.
    """

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        (last_us,) = state.get if state.exists else (None,)
        out_rows: list[tuple] = []
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_us"] = (
                pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64")
            )
            pdf = pdf.sort_values(["_us", "is_series"], ascending=[True, False])
            for _us, is_s, eid in zip(pdf["_us"], pdf["is_series"], pdf["event_id"]):
                if int(is_s) == 1:
                    t = int(_us)
                    last_us = t if last_us is None else max(last_us, t)
                else:
                    out_rows.append((int(eid), key_val, last_us))
        state.update((last_us,))
        out = pd.DataFrame(out_rows, columns=["event_id", "user_id", "matched_us"])
        out["matched_ts"] = pd.to_datetime(out["matched_us"], unit="us")
        yield out[["event_id", "user_id", "matched_ts"]]

    return tagged.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: the first row per key is
    emitted, duplicates arriving within the watermark horizon are dropped,
    and a key's state is evicted once the watermark passes it.

    This is the streaming twin of the batch ``dedup_exact`` operator (and
    the idempotency guard an at-least-once ingest feed needs in front of
    the pipeline). Plain ``dropDuplicates`` on a stream keeps every key
    forever — a 100 TB feed OOMs the state store; the watermark variant
    holds only the horizon's worth of keys.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def dedup_docs_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Content-level streaming dedup: normalized-text md5 fingerprint as
    the key (exactly the batch dedup_exact fingerprint), watermark-bounded."""
    from pyspark.sql import functions as F

    from morphik_core_spark.operators.dedup import normalize_text

    with_fp = docs.withColumn("fp", F.md5(normalize_text(F.col(text_col))))
    return dedup_stream(with_fp, ["fp"], ts_col=ts_col, watermark=watermark)


DEBOUNCE_OUTPUT_SCHEMA = "event_id bigint, user_id bigint, event_type string, ts timestamp"
DEBOUNCE_STATE_SCHEMA = "last_kept_us bigint"


def debounce_stream(
    events: DataFrame,
    min_gap_secs: int,
) -> DataFrame:
    """Streaming debounce with TRUE previous-KEPT-event state — the
    sequential form the batch `sessions.debounce_events` docstring
    declares out of window reach: an event is kept iff at least
    ``min_gap_secs`` passed since the last event this operator KEPT for
    the same (user_id, event_type), so a steady sub-gap drizzle emits
    one event per gap interval instead of only the first (the batch
    lag-gap rule and this rule agree exactly when bursts are shorter
    than the gap — asserted in tests).

    State is ONE bigint (last kept µs) per key; in-batch disorder
    repairs itself via the per-batch (ts, event_id) sort; across
    micro-batches the log-stream ordered-arrival contract applies, same
    as `asof_backward_stream`. Emits kept rows only (append mode —
    suppression is the point here, the batch form keeps the audit flag).
    """
    gap_us = int(min_gap_secs) * 1_000_000

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        user_val, type_val = key
        (last_kept,) = state.get if state.exists else (None,)
        out_rows: list[tuple] = []
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_us"] = (
                pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64")
            )
            pdf = pdf.sort_values(["_us", "event_id"])
            for _us, eid in zip(pdf["_us"], pdf["event_id"]):
                if last_kept is None or int(_us) - last_kept >= gap_us:
                    last_kept = int(_us)
                    out_rows.append((int(eid), user_val, type_val, int(_us)))
        state.update((last_kept,))
        out = pd.DataFrame(out_rows, columns=["event_id", "user_id", "event_type", "_us"])
        out["ts"] = pd.to_datetime(out["_us"], unit="us")
        yield out[["event_id", "user_id", "event_type", "ts"]]

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "series_key string, idx bigint, value bigint, cusum bigint, alarm boolean"
)
CUSUM_STATE_SCHEMA = "s bigint, last_idx bigint"


def cusum_stream(
    series: DataFrame,
    target: int,
    h: int,
    key_col: str = "series_key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming CUSUM monitor — the incremental twin of
    `analytics.cusum_screen(target=...)`: per series key, the textbook
    recursion s = max(0, s + (x − target)) runs AS a recursion (one
    bigint of state), emitting (idx, value, cusum, alarm s > h) per
    point. The batch form needs the closed-form prefix-sum/running-min
    rewrite; here the state IS the running value, which is why CUSUM is
    the standard production drift monitor — O(1) state per key.

    Input is the pre-aggregated series stream (the upstream per-bucket
    rollup is `streaming/incremental`'s job); ``target``/``h`` are the
    trained baseline parameters, exactly as a deployed monitor receives
    them. Points must arrive in non-decreasing ``idx`` order per key
    across micro-batches (the log-stream contract shared by
    `asof_backward_stream`/`debounce_stream`); in-batch disorder
    repairs itself via the per-batch sort. Out-of-order rows across
    batches (idx ≤ last seen) are DROPPED, never applied twice —
    replay-safe under at-least-once delivery. Exact integer state:
    bit-identical to the batch closed form on the same inputs
    (equivalence-tested).
    """
    tgt = int(target)
    hh = int(h)

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        s_val, last_idx = state.get if state.exists else (0, None)
        out_rows: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for i, x in zip(pdf[idx_col], pdf[val_col]):
                i = int(i)
                if last_idx is not None and i <= last_idx:
                    continue  # replayed/out-of-order point: already applied
                last_idx = i
                s_val = max(0, s_val + (int(x) - tgt))
                out_rows.append((key_val, i, int(x), s_val, s_val > hh))
        state.update((s_val, last_idx))
        yield pd.DataFrame(
            out_rows, columns=["series_key", "idx", "value", "cusum", "alarm"]
        )

    return series.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HAMPEL_OUTPUT_SCHEMA = (
    "series_key string, idx bigint, value bigint, med double, is_anomaly boolean"
)
HAMPEL_STATE_SCHEMA = "idxs array<bigint>, vals array<bigint>, last_idx bigint"


def hampel_stream(
    series: DataFrame,
    half_window: int = 12,
    rel_num: int = 1,
    rel_den: int = 2,
    key_col: str = "series_key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming twin of `analytics.rolling_median_flags`: a centered
    rolling-median screen over a live series, with O(window) state per
    key (a ring of the last 2·half_window+1 points).

    A centered window needs ``half_window`` FUTURE points, so the
    stream finalizes point ``t`` when ``t+half_window`` arrives —
    decisions lag the head by half_window points, the inherent latency
    of a centered statistic (the same reason the batch op exists for
    backfills). Early points finalize against left-clipped windows,
    matching the batch op's shrinking edges EXACTLY; the trailing
    half_window points never finalize until the series ends (batch
    equivalence on all finalized points is pinned by test). Same
    ordering/replay contract as `cusum_stream`: non-decreasing idx per
    key across batches, in-batch disorder sorted away, replayed idx ≤
    last seen dropped — at-least-once safe. Flag math is the batch
    op's twice-the-median int64 rule, bit-identical on any engine.
    """
    hw = int(half_window)
    win = 2 * hw + 1

    def _emit(key_val, idxs, vals, center_pos):
        lo = max(0, center_pos - hw)
        hi = min(len(vals) - 1, center_pos + hw)
        neigh = sorted(vals[lo : hi + 1])
        n = len(neigh)
        m2 = 2 * neigh[n // 2] if n % 2 == 1 else neigh[n // 2 - 1] + neigh[n // 2]
        x = vals[center_pos]
        return (
            key_val,
            idxs[center_pos],
            x,
            m2 / 2.0,
            rel_den * abs(2 * x - m2) > rel_num * m2,
        )

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            idxs, vals, last_idx = state.get
            idxs, vals = list(idxs), list(vals)
        else:
            idxs, vals, last_idx = [], [], None
        # n_done = points already finalized = positions dropped from the
        # left of the ring + nothing (the ring keeps exactly the tail
        # needed: every unfinalized center plus hw of lookback)
        out_rows: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for i, x in zip(pdf[idx_col], pdf[val_col]):
                i = int(i)
                if last_idx is not None and i <= last_idx:
                    continue
                last_idx = i
                idxs.append(i)
                vals.append(int(x))
                # newest point sits at position len-1; it finalizes the
                # center hw positions back (if one exists)
                center = len(vals) - 1 - hw
                if center >= 0:
                    out_rows.append(_emit(key_val, idxs, vals, center))
                    # positions before center-hw can never be read again
                    if center - hw > 0:
                        drop = center - hw
                        idxs = idxs[drop:]
                        vals = vals[drop:]
        state.update((idxs[-win:], vals[-win:], last_idx))
        yield pd.DataFrame(
            out_rows, columns=["series_key", "idx", "value", "med", "is_anomaly"]
        )

    return series.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=HAMPEL_OUTPUT_SCHEMA,
        stateStructType=HAMPEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_STREAM_OUTPUT_SCHEMA = "series_key string, n_seen bigint, registers_used int, s bigint"
HLL_STREAM_STATE_SCHEMA = "regs array<int>, n_seen bigint"

_HLL_P = 9
_HLL_M = 1 << _HLL_P
_HLL_WINDOW_BITS = 60 - _HLL_P  # portable_hash is 60-bit


def hll_stream(
    values: DataFrame,
    key_col: str = "series_key",
    value_col: str = "value",
) -> DataFrame:
    """Streaming HyperLogLog — live distinct counting with O(m) state
    per key: the incremental twin of `sketches.hll_registers`. State is
    the 512-register MAX array; each micro-batch folds its values in
    and emits the key's CURRENT ``(n_seen, registers_used, s)`` — the
    dashboard shape (`s` is the scaled-integer harmonic sum exactly as
    the batch op computes it; finalize with
    :func:`hll_stream_estimates`, which runs the IDENTICAL expression
    tree, so a stream that has seen the same rows as a batch sketch is
    BIT-IDENTICAL to it, restart and replay included — MAX-merge makes
    duplicate delivery harmless, so unlike the ordered-series monitors
    this operator is idempotent under at-least-once without an idx
    contract).

    Hashing reproduces `dedup.portable_hash` (md5 hex prefix) in
    Python, so stream, batch, and the DuckDB oracle all agree on every
    register.
    """
    import hashlib

    scale = _HLL_WINDOW_BITS + 1

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            regs, n_seen = state.get
            regs = list(regs)
        else:
            regs, n_seen = [0] * _HLL_M, 0
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None:
                    continue
                h = int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15], 16)
                reg = h % _HLL_M
                w = h // _HLL_M
                rho = _HLL_WINDOW_BITS + 1 - (w.bit_length() if w else 0)
                if rho > regs[reg]:
                    regs[reg] = rho
                n_seen += 1
        state.update((regs, n_seen))
        used = sum(1 for r in regs if r > 0)
        s_occ = sum(1 << (scale - r) for r in regs if r > 0)
        s = s_occ + (_HLL_M - used) * (1 << scale)
        yield pd.DataFrame(
            [(key_val, n_seen, used, s)],
            columns=["series_key", "n_seen", "registers_used", "s"],
        )

    return values.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=HLL_STREAM_OUTPUT_SCHEMA,
        stateStructType=HLL_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_stream_estimates(df: DataFrame) -> DataFrame:
    """Finalize `hll_stream` output rows into ``distinct_est`` with the
    SAME expression tree as `sketches.hll_estimate_from_registers`
    (same DOUBLE literals, same ln) — stream estimates are therefore
    bit-identical to batch estimates over the same rows."""
    m = _HLL_M
    pow_scale = 1 << (_HLL_WINDOW_BITS + 1)
    alpha_expr = f"(0.7213D / (1.0D + 1.079D / {m}.0D))"
    est_raw = f"({alpha_expr} * {m}.0D * {m}.0D * {pow_scale}.0D) / CAST(s AS DOUBLE)"
    return df.withColumn(
        "distinct_est",
        F.expr(
            f"ROUND(CASE WHEN {est_raw} <= 2.5D * {m}.0D AND registers_used < {m} "
            f"THEN {m}.0D * ln({m}.0D / ({m} - registers_used)) "
            f"ELSE {est_raw} END, 6)"
        ),
    )


FUNNEL_OUTPUT_SCHEMA = "user_id bigint, step_index int, step_name string, ts_us bigint"
FUNNEL_STATE_SCHEMA = "times array<bigint>"


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming strict-order funnel — the incremental twin of
    `analytics.funnel_counts`: per user, one timestamp of state per step
    (the earliest valid completion; funnel state is O(n_steps) per key,
    which is why funnels run fine as live monitors). A step-k event at
    time t completes the step when step k−1 is already complete at some
    t' < t and k itself is still open; completions emit exactly one row
    (user, step_index, step_name, ts_us).

    Replay safety is STRUCTURAL, not ordering-based: funnel updates are
    monotone set-once transitions, so a redelivered event finds its step
    already closed and no-ops — at-least-once delivery cannot
    double-emit. The ordering contract matches the other log-stream
    operators (per-key batches arrive in non-decreasing event time;
    in-batch disorder repairs itself via the per-batch sort); a
    cross-batch straggler can only miss an EARLIER completion time for
    an already-closed step, never create a false completion.

    Aggregate the emitted rows with `funnel_stream_counts` for the
    batch-equivalent (step_index, step_name, n_users) readout
    (equivalence test-asserted against `funnel_counts`).

    Changing the funnel definition (length or order of ``steps``)
    invalidates existing state: resuming a checkpoint whose per-user
    ``times`` array was sized under a different steps list fails fast
    with a clear error instead of mis-mapping step indices — reset the
    checkpoint when the funnel changes.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    idx_of = {s: k for k, s in enumerate(steps)}
    n_steps = len(steps)
    typed = events.select(
        F.col(user_col).cast("bigint").alias("user_id"),
        F.expr(f"unix_micros({ts_col})").alias("ts_us"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(list(steps)))

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        (times,) = state.get if state.exists else ([-1] * n_steps,)
        times = list(times)
        if len(times) != n_steps:
            # checkpoint written under a DIFFERENT funnel definition:
            # indexing a stale shorter/longer array with the new step
            # indices would crash or silently mis-map steps. Changing
            # the funnel requires a state reset — fail fast and say so.
            raise ValueError(
                f"funnel_stream state for user {user} holds {len(times)} step "
                f"slots but the query defines {n_steps} steps — the checkpoint "
                "was written under a different funnel definition; reset the "
                "checkpoint (or run with the original steps list)"
            )
        out: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values("ts_us")
            for us, et in zip(pdf["ts_us"], pdf["etype"]):
                k = idx_of.get(et)
                if k is None or times[k] != -1:
                    continue  # unknown step or already closed: no-op
                us = int(us)
                if k == 0 or (times[k - 1] != -1 and us > times[k - 1]):
                    times[k] = us
                    out.append((user, k, steps[k], us))
        state.update((times,))
        yield pd.DataFrame(out, columns=["user_id", "step_index", "step_name", "ts_us"])

    return typed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream_counts(completions: DataFrame) -> DataFrame:
    """Roll `funnel_stream` completions up to the batch `funnel_counts`
    shape: (step_index, step_name, n_users). Each user emits at most one
    completion per step, so a plain count is the distinct-user count."""
    return (
        completions.groupBy("step_index", "step_name")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step_index")
    )


HOLT_OUTPUT_SCHEMA = (
    "series_key string, idx bigint, value bigint, level_micro bigint, "
    "trend_micro bigint, forecast_micro bigint, error_micro bigint"
)
HOLT_STATE_SCHEMA = "l bigint, b bigint, last_idx bigint, n_seen bigint, first_val bigint"


def holt_stream(
    series: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    key_col: str = "series_key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming Holt linear-trend smoother — the incremental twin of
    `analytics.holt_linear`, and the reason Holt-class models run as
    live monitors: the ENTIRE model is two integers of state per key
    (level and trend in micro-units). Each point emits (level, trend,
    one-step forecast made before the point, error), all in micro-units
    so downstream batch finalization divides once.

    Bit-identity with the batch form on the same inputs is structural:
    both run the identical per-step half-away-rounded integer recursion
    with the identical two-point initialization (l₁ = y₁,
    b₁ = y₂ − y₁ — the first point therefore emits no forecast and the
    trend finalizes when the second arrives). Ordering contract matches
    the other series monitors (non-decreasing idx per key across
    batches; in-batch disorder repairs via the per-batch sort; replayed
    idx ≤ last seen are dropped, never applied twice).
    """

    def _round_half_away(x: float) -> int:
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    scale = 1_000_000

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        l_s, b_s, last_idx, n_seen, first_val = (
            state.get if state.exists else (None, None, None, 0, None)
        )
        out: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for i, y in zip(pdf[idx_col], pdf[val_col]):
                i, y = int(i), int(y)
                if last_idx is not None and i <= last_idx:
                    continue  # replayed/out-of-order: already applied
                last_idx = i
                n_seen += 1
                if n_seen == 1:
                    first_val = y
                    out.append((key_val, i, y, y * scale, None, None, None))
                    continue
                if n_seen == 2:
                    # two-point init: state as of point 1 becomes known
                    l_s = first_val * scale
                    b_s = (y - first_val) * scale
                fc = l_s + b_s
                l_new = _round_half_away(alpha * (y * scale) + (1.0 - alpha) * (l_s + b_s))
                b_new = _round_half_away(beta * (l_new - l_s) + (1.0 - beta) * b_s)
                l_s, b_s = l_new, b_new
                out.append((key_val, i, y, l_s, b_s, fc, y * scale - fc))
        state.update((l_s, b_s, last_idx, n_seen, first_val))
        yield pd.DataFrame(
            out,
            columns=[
                "series_key", "idx", "value", "level_micro",
                "trend_micro", "forecast_micro", "error_micro",
            ],
        )

    return series.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = (
    "series_key string, idx bigint, value bigint, ewma_micro bigint, "
    "ucl_micro bigint, lcl_micro bigint, out_of_control boolean"
)
EWMA_STATE_SCHEMA = "l bigint, p double, last_idx bigint"


def ewma_stream(
    series: DataFrame,
    mu: float,
    sigma: float,
    lam: float = 0.2,
    n_sigma: float = 3.0,
    key_col: str = "series_key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming EWMA control chart -- the incremental twin of
    `analytics.ewma_chart`, run against KNOWN process parameters
    (mu, sigma) because a stream cannot see global moments (pass the
    batch op's exact-moment estimates to reproduce its retrospective
    chart; the batch op accepts the same mu/sigma for the comparison).
    State per key is one integer (the EWMA level in micro-units) plus
    one double (the variance factor (1-lam)^(2t), iterated by IEEE
    multiplies exactly like the batch recursion), so stream output is
    bit-identical to `ewma_chart(mu=, sigma=)` over the same rows --
    equivalence test-asserted across a checkpoint restart.

    Ordering contract matches the other series monitors: non-decreasing
    idx per key across batches, in-batch disorder repairs via the
    per-batch sort, replayed idx <= last seen are dropped.
    """

    def _rha(x: float) -> int:
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    lam_f = float(lam)
    one_m = 1.0 - lam_f
    decay = one_m * one_m
    import math as _math

    mu_micro = _rha(float(mu) * 1_000_000)
    base_hw = float(n_sigma) * float(sigma) * _math.sqrt(lam_f / (2.0 - lam_f))

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        l_s, p, last_idx = state.get if state.exists else (mu_micro, 1.0, None)
        out: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for i, y in zip(pdf[idx_col], pdf[val_col]):
                i, y = int(i), int(y)
                if last_idx is not None and i <= last_idx:
                    continue
                last_idx = i
                l_s = _rha(lam_f * (y * 1_000_000) + one_m * l_s)
                p = p * decay
                hw = _rha(base_hw * math.sqrt(1.0 - p) * 1_000_000)
                out.append(
                    (key_val, i, y, l_s, mu_micro + hw, mu_micro - hw,
                     abs(l_s - mu_micro) > hw)
                )
        state.update((l_s, p, last_idx))
        yield pd.DataFrame(
            out,
            columns=[
                "series_key", "idx", "value", "ewma_micro",
                "ucl_micro", "lcl_micro", "out_of_control",
            ],
        )

    return series.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


JSD_OUTPUT_SCHEMA = (
    "monitor_key string, batch_seq bigint, n_seen bigint, jsd_nats double"
)
JSD_STATE_SCHEMA = "cats array<string>, counts array<bigint>, batch_seq bigint"


def jsd_stream(
    events: DataFrame,
    reference: dict[str, int],
    key_col: str = "monitor_key",
    cat_col: str = "category",
) -> DataFrame:
    """Streaming Jensen–Shannon drift monitor — the live twin of
    `analytics.js_divergence`: per key, accumulate the RUNNING category
    histogram in state and emit one row per micro-batch with the JSD
    (nats) between the running distribution and a fixed REFERENCE
    histogram (e.g. last month's event-type mix). State is
    vocabulary-bounded (two parallel arrays); reference categories are
    a broadcast-side constant.

    The finalize runs the batch operator's IDENTICAL per-cell
    expression shape — each cell term p/2·ln(p/m) + q/2·ln(q/m)
    quantized to 1e-12 integers before the cross-cell sum, cells
    iterated in sorted category order — so a stream snapshot equals
    `js_divergence` computed over (reference ∪ seen-so-far) rows
    exactly (equivalence test-asserted across a checkpoint restart).
    Unknown categories (absent from the reference) still drift the
    score: their reference mass is 0 and the term is the exact finite
    p/2·ln 2.
    """
    if not reference or any(v < 0 for v in reference.values()):
        raise ValueError("reference must be a non-empty histogram of counts >= 0")
    ref_items = sorted(reference.items())
    nb = float(sum(reference.values()))
    if nb <= 0:
        raise ValueError("reference histogram must have positive total")

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        cats, counts, seq = (
            state.get if state.exists else ([], [], 0)
        )
        hist = dict(zip(list(cats), [int(c) for c in counts]))
        n_new = 0
        for pdf in batches:
            for c in pdf[cat_col]:
                hist[str(c)] = hist.get(str(c), 0) + 1
                n_new += 1
        seq = int(seq) + 1
        na = float(sum(hist.values()))
        # batch-identical finalize: sorted category union, per-cell
        # 1e-12-quantized terms, integer sum
        cells = sorted(set(hist) | set(reference))
        s = 0
        for c in cells:
            a = hist.get(c, 0)
            b = reference.get(c, 0)
            p = a / na if na > 0 else 0.0
            q = b / nb
            m = (p + q) / 2.0
            # _round_bigint_like_spark, not Python round(): the batch op
            # quantizes with Spark's CAST(ROUND(x*1e12) AS BIGINT)
            # (shortest-repr HALF_UP), where round()'s half-even would
            # diverge on exact .5 boundaries
            if a > 0:
                s += _round_bigint_like_spark((p / 2.0 * math.log(p / m)) * 1e12)
            if b > 0:
                s += _round_bigint_like_spark((q / 2.0 * math.log(q / m)) * 1e12)
        jsd = _round_like_spark(s / 1e12, 8)
        items = sorted(hist.items())
        state.update(([k for k, _ in items], [v for _, v in items], seq))
        yield pd.DataFrame(
            [
                {
                    "monitor_key": key_val,
                    "batch_seq": seq,
                    "n_seen": int(na),
                    "jsd_nats": jsd,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=JSD_OUTPUT_SCHEMA,
        stateStructType=JSD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QUANTILE_OUTPUT_SCHEMA = (
    "monitor_key string, q double, est double, n_seen bigint, batch_seq bigint"
)
QUANTILE_STATE_SCHEMA = "bins array<bigint>, counts array<bigint>, batch_seq bigint"


def quantile_stream(
    events: DataFrame,
    quantiles: list[float],
    bin_width: float = 5.0,
    key_col: str = "monitor_key",
    val_col: str = "value",
) -> DataFrame:
    """Streaming histogram-sketch quantiles — the live twin of
    `analytics.quantile_estimate`: per key, the fixed-width histogram
    rides GroupState (two parallel arrays, bounded by the value range /
    bin width) and each micro-batch emits one snapshot row per
    requested quantile. The latency/SLA percentile monitor that runs
    where the batch rollup runs nightly.

    The finalize replays the batch operator's exact tree: bins sorted,
    exact integer cumulative, covering bin by the same
    (cum ≥ q·n AND cum_prev < q·n) compare, and the identical
    interpolation ``ROUND(bin_lo + width·((q·n − cum_prev)/bin_n), 6)``
    — so a stream snapshot equals `quantile_estimate` computed over the
    same rows (equivalence test-asserted across a checkpoint restart).
    Histogram counts are ADDITIVE, so replayed micro-batches would
    double-count — run behind the CDC/epoch dedup like the other
    additive monitors (the ordering contract note in cusum_stream).
    """
    qs = [float(q) for q in quantiles]
    bw = float(bin_width)

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        bins, counts, seq = state.get if state.exists else ([], [], 0)
        hist = dict(zip([int(b) for b in bins], [int(c) for c in counts]))
        for pdf in batches:
            for v in pdf[val_col]:
                if v is None:
                    continue
                b = int(math.floor(float(v) / bw))
                hist[b] = hist.get(b, 0) + 1
        seq = int(seq) + 1
        n = sum(hist.values())
        out = []
        if n > 0:
            items = sorted(hist.items())
            for q in qs:
                target = q * float(n)
                cum = 0
                for b, c in items:
                    cum_prev = cum
                    cum += c
                    if cum >= target and cum_prev < target:
                        est = round(
                            (b * bw) + bw * ((target - float(cum_prev)) / float(c)), 6
                        )
                        out.append((key_val, q, est, n, seq))
                        break
        items = sorted(hist.items())
        state.update(([b for b, _ in items], [c for _, c in items], seq))
        yield pd.DataFrame(
            out, columns=["monitor_key", "q", "est", "n_seen", "batch_seq"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=QUANTILE_OUTPUT_SCHEMA,
        stateStructType=QUANTILE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CENTROID_DRIFT_OUTPUT_SCHEMA = (
    "label int, batch_seq bigint, n_seen bigint, centroid_shift double"
)
CENTROID_DRIFT_STATE_SCHEMA = "n bigint, sums array<bigint>, batch_seq bigint"


def centroid_drift_stream(
    vectors: DataFrame,
    reference_centroids: dict[int, list[int]],
    key_col: str = "label",
    emb_col: str = "embedding",
    scale_bits: int = 10,
) -> DataFrame:
    """Streaming centroid-drift monitor — the live twin of
    `embedding_stats.embedding_drift`: per label, accumulate the RUNNING
    quantized component sums in state and emit, each micro-batch, the
    Euclidean distance between the running centroid and a fixed
    REFERENCE centroid (e.g. the index-build snapshot's prototype) —
    the alert that says "this class's embedding distribution has moved;
    re-rank its cached kNN / retrain".

    ``reference_centroids`` maps label -> the 2^(2·scale_bits)-grid
    INTEGER centroid (exactly what the batch op computes internally:
    round(round(x·2^b) summed ·2^b / n)), so a stream snapshot equals
    `embedding_drift(reference_snapshot, seen_rows)` bit-for-bit — the
    finalize replays the identical quantize/divide/sqrt tree.

    State per key: one int64 count + dims int64 sums — dimension-
    bounded, mergeable by addition (runs behind epoch dedup like the
    other additive monitors). Labels not in the reference emit NULL
    shift (the batch op's missing-side convention).
    """
    if not reference_centroids:
        raise ValueError("reference_centroids must be non-empty")
    dims = len(next(iter(reference_centroids.values())))
    if any(len(v) != dims for v in reference_centroids.values()):
        raise ValueError("reference centroids must share one dimensionality")
    mul = float(1 << scale_bits)
    scale2 = float(1 << (2 * scale_bits))

    def _rha(x: float) -> int:
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        n, sums, seq = state.get if state.exists else (0, [0] * dims, 0)
        n = int(n)
        sums = [int(s) for s in sums]
        for pdf in batches:
            for vec in pdf[emb_col]:
                for i in range(dims):
                    # same per-component quantization as the batch op's
                    # round(CAST(x AS DOUBLE) * 2^b)
                    sums[i] += _rha(float(vec[i]) * mul)
                n += 1
        seq = int(seq) + 1
        ref = reference_centroids.get(int(key_val))
        shift = None
        if ref is not None and n > 0:
            d2 = 0
            for i in range(dims):
                c_run = _rha(float(sums[i]) * mul / float(n))
                d = c_run - int(ref[i])
                d2 += d * d
            shift = round(math.sqrt(float(d2)) / scale2, 6)
        state.update((n, sums, seq))
        yield pd.DataFrame(
            [
                {
                    "label": int(key_val),
                    "batch_seq": seq,
                    "n_seen": n,
                    "centroid_shift": shift,
                }
            ]
        )

    return vectors.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CENTROID_DRIFT_OUTPUT_SCHEMA,
        stateStructType=CENTROID_DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


W1_DRIFT_OUTPUT_SCHEMA = "key string, batch_seq bigint, n_seen bigint, w1 double"
W1_DRIFT_STATE_SCHEMA = (
    "n bigint, buckets array<bigint>, counts array<bigint>, batch_seq bigint"
)


def _round_bigint_like_spark(x: float) -> int:
    # Spark's CAST(ROUND(d) AS BIGINT) = BigDecimal.valueOf(d) HALF_UP at
    # 0 dp; BigDecimal.valueOf goes through Double.toString (shortest
    # round-tripping decimal repr — Python repr applies the same rule),
    # NOT the exact binary expansion, and NOT Python round()'s half-even.
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _round_like_spark(x: float, decimals: int) -> float:
    # Spark's ROUND(d, n) = BigDecimal.valueOf(d) HALF_UP at n dp.
    # BigDecimal.valueOf goes through Double.toString — the SHORTEST
    # decimal repr that round-trips — not the exact binary expansion,
    # so Decimal(repr(x)) (Python repr = same shortest-repr rule)
    # replicates it; Decimal(x) would diverge on values whose shortest
    # repr ends in an exact 5 at position n+1 (e.g. at 6 dp, 1.5e-06 ->
    # Spark 0.000002, binary-exact 0.000001), and Python round()'s
    # half-even diverges on every exact .5 boundary.
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-int(decimals))
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _round6_like_spark(x: float) -> float:
    return _round_like_spark(x, 6)


def w1_drift_stream(
    rows: DataFrame,
    reference_histograms: dict[str, dict[int, int]],
    key_col: str = "key",
    val_col: str = "value",
    value_scale: int = 1,
) -> DataFrame:
    """Streaming distribution-drift monitor — the live twin of
    `analytics.wasserstein_1d`: per key, accumulate the RUNNING sparse
    value histogram in state and emit, each micro-batch, the 1-D
    Wasserstein-1 distance between the running distribution and a fixed
    REFERENCE histogram (e.g. last week's accepted distribution) — the
    alert that says "this segment's value distribution has moved N
    dollars; investigate before the batch job trips on it".

    ``reference_histograms`` maps key -> {quantized_value: count},
    quantized exactly as the batch op does (ROUND(x * value_scale) half
    away from zero), so a stream snapshot equals
    ``wasserstein_1d(reference_rows, seen_rows, val, value_scale)``
    bit-for-bit: the finalize replays the identical exact-integer
    |gap| x interval-width sum and the identical single division, with
    the final 6-dp rounding replicated at Spark's BigDecimal HALF_UP
    semantics. Keys without a reference emit NULL (the batch family's
    missing-side convention).

    State per key: one int64 count + the sparse (bucket, count) arrays
    — bounded by the caller's quantization contract (dollar-grain
    money, day indexes), mergeable by addition, replay-safe behind the
    same epoch dedup as the other additive monitors.
    """
    if not reference_histograms:
        raise ValueError("reference_histograms must be non-empty")
    refs = {
        str(k): sorted((int(v), int(c)) for v, c in h.items())
        for k, h in reference_histograms.items()
    }
    mul = float(int(value_scale))

    def _rha(x: float) -> int:
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    def _w1(ref: list[tuple[int, int]], run: dict[int, int]) -> float | None:
        na = sum(c for _, c in ref)
        nb = sum(run.values())
        if na == 0 or nb == 0:
            return None
        ref_d = dict(ref)
        spine = sorted(set(ref_d) | set(run))
        num = 0
        cum_a = cum_b = 0
        for v, vn in zip(spine, spine[1:]):
            cum_a += ref_d.get(v, 0)
            cum_b += run.get(v, 0)
            num += abs(cum_a * nb - cum_b * na) * (vn - v)
        return _round6_like_spark(float(num) / (float(na) * float(nb) * mul))

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        n, buckets, counts, seq = (
            state.get if state.exists else (0, [], [], 0)
        )
        hist = {int(b): int(c) for b, c in zip(buckets, counts)}
        n = int(n)
        for pdf in batches:
            for x in pdf[val_col]:
                b = _rha(float(x) * mul)
                hist[b] = hist.get(b, 0) + 1
                n += 1
        seq = int(seq) + 1
        ref = refs.get(str(key_val))
        w1 = _w1(ref, hist) if ref is not None else None
        items = sorted(hist.items())
        state.update((n, [b for b, _ in items], [c for _, c in items], seq))
        yield pd.DataFrame(
            [
                {
                    "key": str(key_val),
                    "batch_seq": seq,
                    "n_seen": n,
                    "w1": w1,
                }
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=W1_DRIFT_OUTPUT_SCHEMA,
        stateStructType=W1_DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PSI_DRIFT_OUTPUT_SCHEMA = (
    "key string, batch_seq bigint, n_seen bigint, n_bins bigint, "
    "psi double, drift boolean"
)
PSI_DRIFT_STATE_SCHEMA = "bins array<string>, counts array<bigint>, batch_seq bigint"


def psi_drift_stream(
    rows: DataFrame,
    reference_histograms: dict[str, dict[str, int]],
    key_col: str = "key",
    bin_col: str = "bin",
    alert_threshold: float = 0.2,
) -> DataFrame:
    """Streaming Population-Stability-Index monitor — the live twin of
    `analytics.population_stability`: per key, accumulate the RUNNING
    bin histogram in state and emit, each micro-batch, the PSI between
    a fixed REFERENCE (baseline) histogram and the distribution seen so
    far, plus the same rounded-then-compared drift flag — the
    between-snapshot drift gate (PSI > 0.2 action) running live instead
    of nightly.

    ``reference_histograms`` maps key -> {bin: count >= 1} (the
    baseline side's per-bin counts; zero/negative counts are rejected
    because the batch twin derives bins from ROWS and cannot represent
    an observed-but-empty bin). The finalize replays the batch
    operator's exact per-bin tree over the UNION of reference and seen
    bins — add-one smoothed p and q as single divisions of exact ints,
    the (p - q)·ln(p/q) double tree quantized to a 1e-12 integer with
    Spark's shortest-repr HALF_UP rounding, integer cross-bin sum,
    ROUND(·, 6) at the edge — so a stream snapshot equals
    ``population_stability(reference_rows, seen_rows, [key], bin)``
    bit-for-bit (equivalence test-asserted across a checkpoint
    restart). Keys without a reference emit NULL psi/n_bins (the
    drift-monitor family's missing-side convention).

    State per key: the sparse (bin, count) arrays — bounded by the bin
    vocabulary, mergeable by addition, replay-safe behind the same
    epoch dedup as the other additive monitors.
    """
    if not reference_histograms:
        raise ValueError("reference_histograms must be non-empty")
    for k, h in reference_histograms.items():
        if not h or any(int(c) <= 0 for c in h.values()):
            raise ValueError(
                f"reference histogram for key {k!r} must be non-empty with "
                f"counts >= 1 (the batch twin derives bins from rows)"
            )
    refs = {
        str(k): {str(b): int(c) for b, c in h.items()}
        for k, h in reference_histograms.items()
    }
    thr = float(alert_threshold)

    def _psi(ref: dict[str, int], run: dict[str, int]) -> tuple[int, float]:
        import math

        bins = sorted(set(ref) | set(run))
        n_bins = len(bins)
        ta = sum(ref.values())
        tb = sum(run.values())
        s = 0
        for b in bins:
            a_c = ref.get(b, 0)
            b_c = run.get(b, 0)
            p = float(a_c + 1) / float(ta + n_bins)
            q = float(b_c + 1) / float(tb + n_bins)
            s += _round_bigint_like_spark((p - q) * math.log(p / q) * 1e12)
        return n_bins, _round_like_spark(s / 1e12, 6)

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        bins, counts, seq = state.get if state.exists else ([], [], 0)
        hist = {str(b): int(c) for b, c in zip(bins, counts)}
        n = sum(hist.values())
        for pdf in batches:
            for b in pdf[bin_col]:
                if b is None:
                    continue
                hist[str(b)] = hist.get(str(b), 0) + 1
                n += 1
        seq = int(seq) + 1
        ref = refs.get(str(key_val))
        if ref is None:
            n_bins, psi, drift = None, None, None
        else:
            n_bins, psi = _psi(ref, hist)
            drift = psi > thr
        items = sorted(hist.items())
        state.update(([b for b, _ in items], [c for _, c in items], seq))
        yield pd.DataFrame(
            [
                {
                    "key": str(key_val),
                    "batch_seq": seq,
                    "n_seen": n,
                    "n_bins": n_bins,
                    "psi": psi,
                    "drift": drift,
                }
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PSI_DRIFT_OUTPUT_SCHEMA,
        stateStructType=PSI_DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MK_TREND_OUTPUT_SCHEMA = (
    "key string, batch_seq bigint, n_points bigint, s_stat bigint, "
    "var_s double, z double, trend string"
)
MK_TREND_STATE_SCHEMA = (
    "s bigint, vals array<bigint>, counts array<bigint>, batch_seq bigint"
)


def mk_trend_stream(
    rows: DataFrame,
    key_col: str = "key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming Mann-Kendall trend monitor — the live twin of
    `analytics.mann_kendall_test`: per key, every arriving value updates
    the exact pairwise statistic INCREMENTALLY (S += #smaller-seen −
    #larger-seen — each new point's pairs against all history, O(state)
    per value, never the O(n^2) pair join), the sparse value histogram
    rides GroupState, and each micro-batch emits the batch op's exact
    output row (S, tie-corrected var, continuity-corrected z, trend
    label at |z| >= 1.96) — the "this metric is now TRENDING, not just
    drifted" alert running live.

    Arrival contract (shared with `asof_backward_stream`): per-key
    event-time-ordered arrival across micro-batches; WITHIN a batch
    rows sort by ``idx_col`` first, so in-batch disorder repairs
    itself. Under that contract a snapshot equals
    ``mann_kendall_test(seen rows)`` bit-for-bit (the z/var trees are
    replayed with Spark's shortest-repr HALF_UP rounding) — asserted
    across a checkpoint restart. State: one int64 S + the value
    histogram, additive, bounded by the quantized value domain.
    """

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        s, vals, counts, seq = state.get if state.exists else (0, [], [], 0)
        hist = {int(v): int(c) for v, c in zip(vals, counts)}
        s = int(s)
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for y in pdf[val_col]:
                y = int(y)
                below = sum(c for v, c in hist.items() if v < y)
                above = sum(c for v, c in hist.items() if v > y)
                s += below - above
                hist[y] = hist.get(y, 0) + 1
        seq = int(seq) + 1
        n = sum(hist.values())
        tie_term = sum(c * (c - 1) * (2 * c + 5) for c in hist.values() if c > 1)
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        var_s = float(var18) / 18.0
        if s > 0:
            z = float(s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = float(s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        z_r = _round_like_spark(z, 6)
        trend = (
            "increasing" if z_r >= 1.96
            else "decreasing" if z_r <= -1.96
            else "none"
        )
        items = sorted(hist.items())
        state.update((s, [v for v, _ in items], [c for _, c in items], seq))
        yield pd.DataFrame(
            [
                {
                    "key": str(key_val),
                    "batch_seq": seq,
                    "n_points": n,
                    "s_stat": s,
                    "var_s": _round_like_spark(var_s, 6),
                    "z": z_r,
                    "trend": trend,
                }
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=MK_TREND_OUTPUT_SCHEMA,
        stateStructType=MK_TREND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PH_OUTPUT_SCHEMA = (
    "key string, batch_seq bigint, n bigint, n_alarms bigint, "
    "first_alarm_idx bigint, max_excess double"
)
PH_STATE_SCHEMA = (
    "s1 bigint, k bigint, m bigint, mn bigint, n_alarms bigint, "
    "first_alarm bigint, max_exc bigint, batch_seq bigint"
)


def page_hinkley_stream(
    rows: DataFrame,
    delta: float = 0.0,
    lam: float = 50.0,
    key_col: str = "key",
    idx_col: str = "idx",
    val_col: str = "value",
) -> DataFrame:
    """Streaming Page-Hinkley change detector — the live twin of
    `analytics.page_hinkley`: per key, the accumulator m, its running
    minimum, the exact integer prefix sum behind the running mean, and
    the alarm bookkeeping all ride GroupState (SIX int64s — the
    smallest state in the monitor family), and each micro-batch emits
    the batch op's exact summary row. The sequential mean-shift alarm
    that runs where the batch scan runs nightly.

    Same trees as the batch op: each step's deviation quantizes with
    Spark's shortest-repr HALF_UP rounding, so a stream snapshot equals
    ``page_hinkley(seen rows)`` bit-for-bit under the per-key ordered-
    arrival contract (in-batch rows sort by ``idx_col``) — asserted
    across a checkpoint restart.
    """
    d = float(delta)
    threshold = float(lam) * 1e6

    def update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        s1, k, m, mn, n_alarms, first_alarm, max_exc, seq = (
            state.get if state.exists else (0, 0, 0, None, 0, None, 0, 0)
        )
        s1, k, m = int(s1), int(k), int(m)
        mn = None if mn is None else int(mn)
        n_alarms = int(n_alarms)
        max_exc = int(max_exc)
        for pdf in batches:
            pdf = pdf.sort_values(idx_col)
            for i, y in zip(pdf[idx_col], pdf[val_col]):
                y = int(y)
                s1 += y
                k += 1
                dev = _round_bigint_like_spark(
                    (float(y) - float(s1) / float(k) - d) * 1e6
                )
                m += dev
                mn = m if mn is None else min(mn, m)
                exc = m - mn
                max_exc = max(max_exc, exc)
                if float(exc) > threshold:
                    n_alarms += 1
                    if first_alarm is None:
                        first_alarm = int(i)
        seq = int(seq) + 1
        state.update((s1, k, m, mn, n_alarms, first_alarm, max_exc, seq))
        yield pd.DataFrame(
            [
                {
                    "key": str(key_val),
                    "batch_seq": seq,
                    "n": k,
                    "n_alarms": n_alarms,
                    "first_alarm_idx": first_alarm,
                    "max_excess": _round_like_spark(float(max_exc) / 1e6, 6),
                }
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PH_OUTPUT_SCHEMA,
        stateStructType=PH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
