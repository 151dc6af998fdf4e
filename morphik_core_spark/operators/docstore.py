"""Document-store mutation ops on immutable Parquet: upsert, folder moves,
composite-key batch get, grouped chunk responses.

The reference mutates Postgres rows in place; on Parquet every mutation is
a snapshot rewrite expressed relationally (SURVEY §7 "hard parts"):

- upsert            = updates ∪ (base ⟕anti updates)
  (reference postgres_database.py:227-298 upsert doc row)
- folder subtree move = path-prefix rewrite of descendants
  (reference postgres_database.py:1782-2085)
- batch get          = semi-join on the composite key tuple list
  (reference pgvector_store.py:509-571 ``tuple_(...)``)
- grouped response   = padding flags + per-document ordering
  (reference document_service.py:692-819)

At scale the rewrite targets only affected partitions (partition the
documents table by app_id; overwrite dynamic partitions) — the operators
here produce the new snapshot DataFrame; the writer decides granularity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert", "move_folder", "batch_get", "grouped_response"]


def upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """New snapshot where update rows replace base rows on the key."""
    untouched = base.join(updates.select(*keys), on=list(keys), how="left_anti")
    return untouched.unionByName(updates)


def move_folder(
    docs: DataFrame,
    old_prefix: str,
    new_prefix: str,
    path_col: str = "folder_path",
) -> DataFrame:
    """Rewrite ``old_prefix`` → ``new_prefix`` for the folder and all
    descendants; other rows unchanged."""
    path = F.col(path_col)
    old = old_prefix.rstrip("/")
    new = new_prefix.rstrip("/")
    affected = (path == old) | path.startswith(old + "/")
    rewritten = F.concat(F.lit(new), F.substring(path, len(old) + 1, 1_000_000))
    return docs.withColumn(path_col, F.when(affected, rewritten).otherwise(path))


def batch_get(
    table: DataFrame,
    keys: Sequence[tuple],
    key_cols: Sequence[str],
) -> DataFrame:
    """Rows whose composite key is in the requested tuple list.

    The key list is a broadcast semi-join (never an OR-chain predicate —
    constant-folding thousands of tuples bloats the plan; a join scales)."""
    spark = table.sparkSession
    from morphik_core_spark.plans.literal import literal_frame_from_schema

    schema = ", ".join(f"{c} {t}" for c, t in zip(key_cols, _key_types(table, key_cols)))
    wanted = literal_frame_from_schema(spark, schema, [tuple(k) for k in keys])
    return table.join(F.broadcast(wanted), on=list(key_cols), how="left_semi")


def _key_types(table: DataFrame, key_cols: Sequence[str]) -> list[str]:
    by_name = {f.name: f.dataType.simpleString() for f in table.schema.fields}
    return [by_name[c] for c in key_cols]


def grouped_response(
    padded: DataFrame,
    matches: DataFrame,
    doc_col: str = "document_id",
    num_col: str = "chunk_number",
) -> DataFrame:
    """Flag padding rows: is_padding = (key ∉ original matches), ordered
    (document_id, chunk_number) — the flattened GroupedChunkResponse."""
    # distinct: the flag lookup must never multiply padded rows when the
    # match set carries duplicate chunk keys
    match_keys = matches.select(doc_col, num_col).distinct().withColumn("_is_match", F.lit(1))
    return (
        padded.join(match_keys, on=[doc_col, num_col], how="left")
        .withColumn("is_padding", F.col("_is_match").isNull())
        .drop("_is_match")
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch (ops I/U/D) to a snapshot — the SCD1
    MERGE: deletes drop base rows, updates replace them, inserts append.

    ``changes`` carries the snapshot's payload columns plus ``op_col``
    ('I' | 'U' | 'D'); the batch is assumed key-deduplicated (one final
    op per key — the standard compaction contract of a CDC feed; apply
    ``row_number() over (key ORDER BY seq DESC)`` upstream otherwise).

    Plan: ONE left-anti join keyed on ``key_cols`` (drops deleted AND
    replaced rows) + a union of the U/I payloads. At 100 TB the batch is
    small relative to the snapshot → the anti-join broadcasts the change
    keys and the snapshot never shuffles; pair with
    `plans.partitioning.merge_upsert_partitioned` to rewrite only the
    partitions the batch touches.

    'I' keys join the touched set too, making inserts upsert-safe: a feed
    that emits I for a key already present replaces the base row instead
    of silently duplicating the key (same cost — the touched set is built
    from the whole batch either way, and a true insert's key simply
    anti-matches nothing).
    """
    keys = list(key_cols)
    touched = changes.select(*keys).distinct()
    kept = snapshot.join(touched, on=keys, how="left_anti")
    incoming = changes.filter(F.col(op_col).isin("U", "I")).drop(op_col)
    return kept.unionByName(incoming.select(*snapshot.columns))
