"""Chunking splitter semantics, hash embedder consistency, text functions,
and the end-to-end (streaming) ingestion pipeline."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from morphik_core_spark.functions.chunking import chunk_documents, split_text
from morphik_core_spark.functions.embedder import (
    hash_embed,
    hash_embed_components,
    hash_embed_udf,
)
from morphik_core_spark.functions.text import (
    clean_control_chars,
    normalize_filename,
    filename_search,
    token_count,
)
from morphik_core_spark.streaming.ingestion import ingest_batch, run_ingestion_stream


# ------------------------------------------------------------- splitter


def test_short_text_single_chunk():
    assert split_text("hello world", chunk_size=100, chunk_overlap=10) == ["hello world"]
    assert split_text("", 100, 10) == []


def test_split_respects_paragraphs():
    text = "para one is here\n\npara two is here\n\npara three"
    chunks = split_text(text, chunk_size=20, chunk_overlap=0)
    assert all(len(c) <= 20 for c in chunks)
    assert "".join(chunks).replace("\n\n", "") == text.replace("\n\n", "")


def test_overlap_prepends_previous_tail():
    text = "aaaa bbbb cccc dddd eeee ffff gggg hhhh"
    chunks = split_text(text, chunk_size=12, chunk_overlap=4)
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur.startswith(prev[-4:])


def test_overlap_compounds_per_recursion_level():
    # Reference parity: the overlap block runs at the end of EVERY
    # _split_recursive level (morphik_parser.py:96-107), so a chunk that
    # recursed through k separator levels gets k overlap prepends.
    # Hand-traced: "ab cd ef gh" at size 5 splits only at the " " level
    # (4 levels deep), so each level re-prepends the previous chunk's
    # 2-char tail.
    out = split_text("ab cd ef gh", chunk_size=5, chunk_overlap=2)
    assert out == ["ab ", "b b b b cd ", "d d d d ef gh"]


def test_hard_split_no_separators():
    text = "x" * 25
    chunks = split_text(text, chunk_size=10, chunk_overlap=0)
    assert chunks == ["x" * 10, "x" * 10, "x" * 5]


def test_chunk_documents_contiguous_numbers(spark):
    df = spark.createDataFrame(
        [("d1", "one two three four five six seven eight nine ten " * 20)],
        "external_id string, text string",
    )
    out = chunk_documents(df, chunk_size=100, chunk_overlap=10).collect()
    nums = sorted(r.chunk_number for r in out)
    assert nums == list(range(len(nums))) and len(nums) > 1


def test_contextual_chunks_prepends_context(spark):
    from morphik_core_spark.functions.chunking import contextual_chunks

    chunks = spark.createDataFrame(
        [("d1", 0, "the raw chunk body")], "document_id string, chunk_number int, content string"
    )
    out = contextual_chunks(chunks, situate=lambda t: f"[ctx:{len(t)} chars]").first()
    assert out.content == "[ctx:18 chars]\n\nthe raw chunk body"


# ------------------------------------------------------------- embedder


def test_hash_embed_deterministic_and_normalized():
    a = hash_embed("the quick brown fox")
    b = hash_embed("the quick brown fox")
    assert a == b
    assert math.isclose(float(np.linalg.norm(a)), 1.0, rel_tol=1e-9)
    assert hash_embed("") == [0.0] * 16


def test_hash_embed_udf_matches_python(spark):
    texts = ["the quick brown fox", "spark engines shuffle", "a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(hash_embed_udf()(F.col("text")).alias("e")).collect()
    for row, t in zip(got, texts):
        assert row.e == pytest.approx(hash_embed(t), abs=1e-12)


def test_relational_components_match_python(spark):
    """The sparse relational form must reproduce the python embedder
    (pre-normalization) exactly — this is what the oracle checks."""
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    comps = {r.idx: r.val for r in hash_embed_components(df, "text", "id").collect()}
    dense = np.zeros(16)
    for idx, val in comps.items():
        dense[idx] = val
    norm = np.linalg.norm(dense)
    expect = np.asarray(hash_embed(text))
    assert np.allclose(dense / norm, expect, atol=1e-12)


# ------------------------------------------------------------- text fns


def test_clean_and_count(spark):
    df = spark.createDataFrame([("a\x00b\x01c  d\te",)], "t string")
    row = df.select(
        clean_control_chars(F.col("t")).alias("clean"),
        token_count(F.col("t")).alias("n"),
    ).first()
    assert row.clean == "abc  d\te"
    assert row.n == 3


def test_normalize_filename(spark):
    df = spark.createDataFrame([("Quarterly_Report-Q3_final.PDF",)], "f string")
    assert df.select(normalize_filename(F.col("f")).alias("n")).first().n == "quarterly report q3 final"


def test_filename_search_ranks_by_overlap(spark):
    df = spark.createDataFrame(
        [("a", "Quarterly_Report_Q3.pdf"), ("b", "random-notes.txt"), ("c", "q3_summary.pdf")],
        "external_id string, filename string",
    )
    got = [r.external_id for r in filename_search(df, "q3 report").collect()]
    assert got[0] == "a" and "b" not in got


# ------------------------------------------------------- ingest pipeline


def test_ingest_batch_status_lifecycle(spark):
    raw = spark.createDataFrame(
        [
            ("d1", "a.txt", "text/plain", "hello world " * 50, None, "app1", "/x"),
            ("d2", "b.txt", "text/plain", None, None, "app1", "/x"),
            ("d3", "c.txt", "text/plain", "   ", None, "app1", "/x"),
        ],
        "external_id string, filename string, content_type string, text string, metadata string, app_id string, folder_path string",
    )
    documents, chunks = ingest_batch(raw, chunk_size=100, chunk_overlap=10)
    status = {r.external_id: r.status for r in documents.collect()}
    assert status == {"d1": "completed", "d2": "failed", "d3": "failed"}
    ch = chunks.collect()
    assert {r.document_id for r in ch} == {"d1"}
    assert all(len(r.embedding) == 16 for r in ch)


def test_streaming_ingestion_end_to_end(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    raw = spark.createDataFrame(
        [("s1", "a.txt", "text/plain", "alpha beta gamma " * 30, None, "app1", "/f"),
         ("s2", "b.txt", "text/plain", None, None, "app1", "/f")],
        "external_id string, filename string, content_type string, text string, metadata string, app_id string, folder_path string",
    )
    raw.write.parquet(inp)
    run_ingestion_stream(spark, inp, out, chunk_size=80, chunk_overlap=8)

    docs = spark.read.parquet(os.path.join(out, "documents"))
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert {r.status for r in docs.collect()} == {"completed", "failed"}
    assert chunks.filter(F.col("document_id") == "s1").count() > 1
    # idempotent restart: no new files → no duplicate appends
    run_ingestion_stream(spark, inp, out, chunk_size=80, chunk_overlap=8)
    assert spark.read.parquet(os.path.join(out, "documents")).count() == 2
    # replayed epoch (lost checkpoint → the same files reprocess as epoch 0):
    # dynamic partition overwrite replaces _epoch=0 instead of appending
    import shutil

    shutil.rmtree(os.path.join(out, "_checkpoint"))
    run_ingestion_stream(spark, inp, out, chunk_size=80, chunk_overlap=8)
    assert spark.read.parquet(os.path.join(out, "documents")).count() == 2
