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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_counter_stream"]

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
