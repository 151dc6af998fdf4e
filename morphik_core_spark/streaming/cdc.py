"""Streaming CDC apply: a change feed (I/U/D ops) continuously merged
into a versioned snapshot table — the Debezium-consumer shape.

The batch operator is :func:`morphik_core_spark.operators.docstore.cdc_apply`
(one key anti-join + union). The streaming form wraps it in
``foreachBatch``:

1. each micro-batch is compacted to ONE final op per key (latest by the
   feed's sequence column — the standard CDC compaction contract);
2. the compacted batch merges into the latest snapshot version;
3. the result commits as a NEW version through
   ``plans.maintenance.versioned_write`` with the batch's ``epoch_id``
   recorded in the manifest.

Replay safety: ``foreachBatch`` is at-least-once, so a crashed epoch can
re-run. The epoch id in the manifest is the idempotency key — a replayed
epoch finds itself already committed and does nothing, which is exactly
the trick ``streaming/ingestion`` plays with partition overwrite, moved
to the manifest layer because a CDC merge rewrites the whole (logical)
snapshot rather than one partition. Versioning also gives time travel
over the merge history for free: every pre-merge state stays readable.

Scale shape: per micro-batch cost is the batch compaction window (batch-
sized) + one anti-join keyed on the snapshot key (batch keys broadcast)
+ the snapshot write. At 100 TB pair with partition-granular rewrite
(`plans.partitioning.merge_upsert_partitioned`) so step 3 touches only
the partitions the batch keys land in; the manifest protocol is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from morphik_core_spark.operators.docstore import cdc_apply
from morphik_core_spark.plans.maintenance import (
    list_versions,
    read_version,
    versioned_write,
)

__all__ = ["compact_changes", "apply_cdc_epoch", "run_cdc_stream"]


def compact_changes(
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """One final op per key: the latest change by ``seq_col`` wins (ties
    break to the row whose op sorts last, so a same-seq U+D pair resolves
    deterministically). Output drops ``seq_col``; this is the compaction
    every CDC consumer runs before merging a batch."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )


def apply_cdc_epoch(
    batch: DataFrame,
    epoch_id: int,
    table_path: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> bool:
    """Merge one change batch into the snapshot table as a new version.

    Returns False without writing when this epoch is already in the
    manifest (crash replay) or the batch is empty. The table must be
    seeded with a version 0 snapshot (``versioned_write``) before the
    stream starts — the schema contract comes from the seed, not the feed.
    """
    tag = f"cdc:{int(epoch_id)}"
    if any(v.get("op") == tag for v in list_versions(table_path)):
        return False
    compacted = compact_changes(batch, keys, op_col=op_col, seq_col=seq_col)
    if not compacted.take(1):
        return False
    base = read_version(batch.sparkSession, table_path)
    merged = cdc_apply(base, compacted, keys, op_col=op_col)
    versioned_write(merged, table_path, op=tag)
    return True


def run_cdc_stream(
    changes_stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Wire a streaming change feed into the snapshot table.

    ``Trigger.AvailableNow`` + checkpoint: restarts resume at the first
    unprocessed batch, and replays of processed ones no-op via the
    manifest epoch tag. Returns the started query (caller awaits it).
    """

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_epoch(batch_df, epoch_id, table_path, keys, op_col=op_col, seq_col=seq_col)

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
