"""Ingestion pipeline: parse → clean → chunk → embed → index, as one
DataFrame transformation, runnable in batch or as Structured Streaming.

Spark restatement of the reference's worker pipeline
(/root/reference/core/workers/ingestion_worker.py:336-1489, SURVEY §3.3):
each arq job boundary becomes a stage boundary; per-document progress
becomes a row-level ``status`` column (processing → completed/failed).

Batch form:      ``ingest_batch(raw_docs)`` → (documents, chunks)
Streaming form:  ``run_ingestion_stream`` — file source → ``foreachBatch``
                 of the same batch pipeline → parquet sinks, with
                 ``Trigger.AvailableNow`` for batch-parity semantics
                 (process everything present, then stop).

Scale notes: the pipeline is per-document parallel until the final write;
chunks are written partitioned so downstream retrieval prunes. Embedding
runs inside the chunk rows' partitions (pandas UDF batches) — on a real
cluster those are the GPU executors; the hash embedder stands in here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.functions.chunking import chunk_documents
from morphik_core_spark.functions.embedder import hash_embed_udf
from morphik_core_spark.functions.text import clean_control_chars

__all__ = ["ingest_batch", "run_ingestion_stream", "RAW_DOC_SCHEMA"]

RAW_DOC_SCHEMA = (
    "external_id string, filename string, content_type string, text string, "
    "metadata string, app_id string, folder_path string"
)


def ingest_batch(
    raw_docs: DataFrame,
    chunk_size: int = 512,
    chunk_overlap: int = 64,
    embed_dims: int = 16,
    embedder=None,
) -> tuple[DataFrame, DataFrame]:
    """(documents, chunks): documents carry the status lifecycle; chunks
    carry content + embeddings.

    A document fails (status='failed') when it has no usable text —
    the reference marks parse failures the same way; other rows complete.
    ``embedder`` overrides the default seeded hash embedder with any
    text→array<double> UDF (the production-model hook).
    """
    cleaned = raw_docs.withColumn("text", clean_control_chars(F.col("text")))
    ok = cleaned.filter(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
    failed = cleaned.join(ok.select("external_id"), "external_id", "left_anti")

    chunks = chunk_documents(ok, text_col="text", id_col="external_id", chunk_size=chunk_size, chunk_overlap=chunk_overlap)
    embedder = embedder or hash_embed_udf(dims=embed_dims)
    chunks = chunks.select(
        "document_id",
        "chunk_number",
        "content",
        embedder(F.col("content")).alias("embedding"),
        *[c for c in ("app_id", "folder_path") if c in chunks.columns],
    )

    documents = ok.withColumn("status", F.lit("completed")).unionByName(
        failed.withColumn("status", F.lit("failed"))
    )
    return documents, chunks


def run_ingestion_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    chunk_size: int = 512,
    chunk_overlap: int = 64,
    embed_dims: int = 16,
) -> None:
    """Structured-Streaming ingestion over a parquet drop directory.

    ``Trigger.AvailableNow`` + ``foreachBatch``, with effectively-once
    sinks: each write is partitioned by the micro-batch ``epoch_id`` and
    uses dynamic partition overwrite, so a crashed-and-retried epoch
    replaces its own partition instead of appending duplicates (plain
    parquet append is only at-least-once — foreachBatch re-runs the whole
    batch on recovery). The ``_epoch`` partition column is physical layout
    only; readers that don't select it are unaffected. A transactional
    table format (Delta/Iceberg) is the production-grade version of the
    same idea. Stops when the backlog drains; new files dropped into
    ``input_dir`` are picked up on the next run via the checkpoint.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    stream = spark.readStream.schema(RAW_DOC_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        documents, chunks = ingest_batch(batch_df, chunk_size, chunk_overlap, embed_dims)
        for df, sub in ((documents, "documents"), (chunks, "chunks")):
            (
                df.withColumn("_epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch")
                .parquet(os.path.join(output_dir, sub))
            )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
