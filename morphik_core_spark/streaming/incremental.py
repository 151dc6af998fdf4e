"""Streaming rollup maintenance: a raw event stream continuously folded
into a persisted mergeable-aggregate state table — the materialized-view
shape for standing metrics (per-key counts/sums/means) at any scale.

The batch algebra is :mod:`morphik_core_spark.operators.incremental`
(DECIMAL-exact mergeable state). The streaming form wraps it in
``foreachBatch`` exactly like :mod:`streaming.cdc` wraps ``cdc_apply``:

1. each micro-batch aggregates to a DELTA state (batch-keyed shuffle —
   the only work proportional to the batch);
2. the delta merges into the latest persisted state (state-sized, not
   corpus-sized);
3. the merged state commits as a new version via
   ``plans.maintenance.versioned_write`` tagged ``rollup:<epoch>``.

Replay safety is the manifest-epoch trick: ``foreachBatch`` is
at-least-once, so a crashed epoch may re-run — the tag makes the replay
a no-op, which keeps the state EXACTLY-once even though delivery isn't.
This is what `dropDuplicatesWithinWatermark`-style dedup can't give an
aggregate: re-delivered ROWS would re-count, but re-delivered EPOCHS
don't re-merge.

Why not `groupBy().agg()` in update mode? Native streaming aggregation
keeps key state in the state store and can't be read as a table mid-
stream, snapshotted, time-traveled, or merged across independent jobs.
The versioned-state-table form gives all four, at the cost of a
state-table rewrite per epoch — pair with partitioned state +
`merge_upsert_partitioned` when the key space outgrows one file set
(same evolution path streaming/cdc documents).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame

from morphik_core_spark.operators.incremental import agg_state, merge_agg_states
from morphik_core_spark.plans.maintenance import (
    list_versions,
    read_version,
    versioned_write,
)

__all__ = ["apply_rollup_epoch", "run_rollup_stream"]


def apply_rollup_epoch(
    batch: DataFrame,
    epoch_id: int,
    table_path: str,
    keys: Sequence[str],
    measures: Mapping[str, str],
) -> bool:
    """Fold one raw micro-batch into the persisted rollup state as a new
    version. Returns False without writing when the epoch is already in
    the manifest (crash replay) or the batch is empty. Seed the table
    with a version-0 state (``versioned_write(agg_state(seed_or_empty,
    ...), path, op="seed")``) before starting — the schema contract
    comes from the seed."""
    tag = f"rollup:{int(epoch_id)}"
    if any(v.get("op") == tag for v in list_versions(table_path)):
        return False
    delta = agg_state(batch, keys, measures)
    if not delta.take(1):
        return False
    base = read_version(batch.sparkSession, table_path)
    merged = merge_agg_states([base, delta], keys)
    versioned_write(merged, table_path, op=tag)
    return True


def run_rollup_stream(
    events_stream: DataFrame,
    table_path: str,
    keys: Sequence[str],
    measures: Mapping[str, str],
    checkpoint: str,
):
    """Wire a raw event stream into the rollup state table.

    ``Trigger.AvailableNow`` + checkpoint: restarts resume at the first
    unprocessed batch; replays of processed epochs no-op via the
    manifest tag. Returns the started query (caller awaits it)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_rollup_epoch(batch_df, epoch_id, table_path, keys, measures)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
