"""Streaming join-view maintenance: a unified CDC change bus (both
sides of a keyed equi-join on one stream) continuously folded into a
persisted, versioned materialized-join table.

The batch algebra is `operators.incremental.incremental_join_apply_both`
(double anti-join + post-batch dimension + view-side revival — work
stays delta-sized per epoch, never |A| × |B|). This module wraps it in
``foreachBatch`` exactly like :mod:`streaming.incremental` wraps the
rollup merge and :mod:`streaming.cdc` wraps `cdc_apply`:

1. each micro-batch SPLITS by its ``side`` column into ΔA (fact rows,
   keyed ``pk_a``) and ΔB (dimension rows, keyed ``join_key``) — the
   shape a real CDC bus delivers, where one epoch can carry both an
   order batch and a customer batch;
2. the current view version and the current B-snapshot version read
   back from their manifests, the joint delta decomposition produces
   the next view, and the B snapshot absorbs ΔB (anti + union —
   dimension-sized);
3. BOTH tables commit as new versions tagged ``joinview:<epoch>`` /
   ``bsnap:<epoch>`` via `plans.maintenance.versioned_write`.

Replay safety is the manifest-epoch trick shared with the rollup
stream: ``foreachBatch`` is at-least-once, so a crashed epoch can
re-run — the tag check makes the replay a no-op on both tables, keeping
view and snapshot in lockstep (a half-applied epoch is impossible to
OBSERVE: the view commits first, and a crash between the two writes
replays the epoch, which re-commits only the missing snapshot — the tag
is checked per table).

Scale: per epoch, work is the two broadcast anti-joins + delta-sized
probe joins of the batch twin plus one dimension pass; the view
rewrite per epoch is the versioned-table cost the rollup stream already
documents (partitioned state + merge_upsert_partitioned is the
evolution path when the view outgrows one file set).

Self-maintainability boundary (inherited from the batch op): WITHOUT an
A snapshot the view is the only A store, so a dimension key deleted in
one epoch and re-inserted in a LATER epoch re-attaches no old fact rows
— they left the inner-join view with the delete. The equivalence tests
pin that behavior explicitly. Passing ``a_path`` (a seeded versioned A
snapshot, maintained by the same epochs under ``asnap:<epoch>`` tags)
CLOSES the gap: revival then draws from A, and the
delete-then-reinsert scenario resurrects the surviving facts — also
tested.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphik_core_spark.operators.incremental import incremental_join_apply_both
from morphik_core_spark.plans.cache import persist_scope, scoped_persist
from morphik_core_spark.plans.maintenance import (
    list_versions,
    read_version,
    versioned_write,
)

__all__ = ["apply_join_view_epoch", "run_join_view_stream"]


def apply_join_view_epoch(
    batch: DataFrame,
    epoch_id: int,
    view_path: str,
    b_path: str,
    pk_a: str,
    join_key: str,
    a_cols: Sequence[str],
    b_cols: Sequence[str],
    side_col: str = "side",
    op_col: str = "op",
    a_path: str | None = None,
) -> bool:
    """Fold one unified CDC micro-batch into the persisted join view and
    B snapshot as new versions. ``a_cols`` are the A-side payload
    columns of the bus (including ``pk_a`` and ``join_key``); ``b_cols``
    the B-side attribute columns (excluding ``join_key``). Returns False
    without writing when the epoch is already applied to BOTH tables
    (crash replay) or the batch is empty. Seed both tables first
    (``versioned_write(view0, view_path, op="seed")`` and the B
    snapshot likewise) — the schema contract comes from the seeds.

    Passing ``a_path`` (a seeded, versioned A snapshot) upgrades the
    view past the self-maintainability boundary: the epoch ALSO
    maintains A' = (A anti ΔA-keys) ∪ ΔA-upserts (tag ``asnap:<epoch>``)
    and revival draws from the A snapshot instead of the view, so a
    dimension key deleted in one epoch and re-inserted later re-attaches
    its surviving facts."""
    view_tag = f"joinview:{int(epoch_id)}"
    bsnap_tag = f"bsnap:{int(epoch_id)}"
    asnap_tag = f"asnap:{int(epoch_id)}"
    view_done = any(v.get("op") == view_tag for v in list_versions(view_path))
    bsnap_done = any(v.get("op") == bsnap_tag for v in list_versions(b_path))
    asnap_done = a_path is None or any(
        v.get("op") == asnap_tag for v in list_versions(a_path)
    )
    if view_done and bsnap_done and asnap_done:
        return False
    if not batch.take(1):
        return False
    spark = batch.sparkSession
    # Each split delta feeds 3-4 downstream joins (key projections,
    # upsert unions, revival) and the snapshots feed the view maintenance
    # AND their own absorb pass — persist for the epoch so every action
    # doesn't re-filter the micro-batch source / re-read the snapshot
    # files, and release unconditionally at epoch end.
    with persist_scope():
        delta_a = scoped_persist(
            batch.filter(F.col(side_col) == "A").select(*a_cols, op_col)
        )
        delta_b = scoped_persist(
            batch.filter(F.col(side_col) == "B").select(join_key, *b_cols, op_col)
        )
        b = scoped_persist(read_version(spark, b_path))
        a = (
            scoped_persist(read_version(spark, a_path))
            if a_path is not None
            else None
        )
        if not view_done:
            view = read_version(spark, view_path)
            maintained = incremental_join_apply_both(
                view, delta_a, b, delta_b, pk_a, join_key, b_cols=b_cols,
                op_col=op_col, a_for_revival=a,
            )
            versioned_write(maintained, view_path, op=view_tag)
        if not bsnap_done:
            kb = delta_b.select(join_key).distinct()
            b_new = b.join(F.broadcast(kb), join_key, "left_anti").unionByName(
                delta_b.filter(F.col(op_col) != "D").drop(op_col)
            )
            versioned_write(b_new, b_path, op=bsnap_tag)
        if a_path is not None and not asnap_done:
            ka = delta_a.select(F.col(pk_a)).distinct()
            a_new = a.join(F.broadcast(ka), pk_a, "left_anti").unionByName(
                delta_a.filter(F.col(op_col) != "D").drop(op_col)
            )
            versioned_write(a_new, a_path, op=asnap_tag)
    return True


def run_join_view_stream(
    changes_stream: DataFrame,
    view_path: str,
    b_path: str,
    pk_a: str,
    join_key: str,
    a_cols: Sequence[str],
    b_cols: Sequence[str],
    checkpoint: str,
    side_col: str = "side",
    op_col: str = "op",
    a_path: str | None = None,
):
    """Wire a unified two-sided CDC bus into the join view.

    ``Trigger.AvailableNow`` + checkpoint: restarts resume at the first
    unprocessed batch; replays of applied epochs no-op via the per-table
    manifest tags. Returns the started query (caller awaits it)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_join_view_epoch(
            batch_df,
            epoch_id,
            view_path,
            b_path,
            pk_a,
            join_key,
            a_cols,
            b_cols,
            side_col=side_col,
            op_col=op_col,
            a_path=a_path,
        )

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
