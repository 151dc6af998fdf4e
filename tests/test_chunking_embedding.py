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


_TRACE_CHUNKS_SQL = """
WITH RECURSIVE
docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND len(text) > 0),
small AS (SELECT doc_id, 0 AS chunk_no, text AS c FROM docs WHERE len(text) <= 256),
big AS (SELECT doc_id, string_split(text, ' ') AS parts FROM docs WHERE len(text) > 256),
words AS (
  SELECT doc_id, i AS idx,
         parts[i] || CASE WHEN parts[i] <> parts[len(parts)] THEN ' ' ELSE '' END AS piece
  FROM big, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) t
),
plen AS (
  SELECT doc_id, idx, piece, SUM(len(piece)) OVER (PARTITION BY doc_id ORDER BY idx) AS s
  FROM words
),
stream AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY idx) AS full_stream, max(s) AS total
  FROM plen GROUP BY doc_id
),
rec AS (
  SELECT doc_id, -1 AS chunk_no, CAST(0 AS BIGINT) AS start_s, CAST(0 AS BIGINT) AS end_s, total FROM stream
  UNION ALL
  SELECT rec.doc_id, rec.chunk_no + 1, rec.end_s,
         (SELECT max(p.s) FROM plen p WHERE p.doc_id = rec.doc_id AND p.s - rec.end_s <= 256),
         rec.total
  FROM rec WHERE rec.end_s < rec.total
),
c0 AS (
  SELECT r.doc_id, r.chunk_no,
         substring(st.full_stream, CAST(r.start_s AS INT) + 1, CAST(r.end_s - r.start_s AS INT)) AS c
  FROM rec r JOIN stream st USING (doc_id) WHERE r.chunk_no >= 0
),
p1 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM c0),
p2 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p1),
p3 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p2),
p4 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p3),
allc AS (SELECT * FROM small UNION ALL SELECT * FROM p4)
SELECT doc_id, chunk_no, c FROM allc ORDER BY doc_id, chunk_no
"""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_sql_trace_equals_recursive_splitter(sf):
    """The chunk_stats oracle encodes the splitter's execution trace on the
    corpus shape (single-line, space-delimited, no word > chunk_size): this
    witness asserts chunk-by-chunk string equality between that SQL trace
    and the real recursive splitter, over every document at both SFs. If
    the corpus generator ever adds newlines / '. ' / giant words, this
    fails loudly BEFORE the driver's oracle does."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'"
    )
    # precondition of the trace reduction, asserted so drift fails here
    n_bad = con.execute(
        "SELECT count(*) FROM documents WHERE contains(text, chr(10)) "
        "OR contains(text, '. ') OR len(text) = 0"
    ).fetchone()[0]
    assert n_bad == 0, "corpus shape changed: chunk_stats oracle trace no longer valid"

    got: dict[int, list[str]] = {}
    for doc_id, _, c in con.execute(_TRACE_CHUNKS_SQL).fetchall():
        got.setdefault(doc_id, []).append(c)
    for doc_id, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
        expected = split_text(text, 256, 32)
        assert got.get(doc_id, []) == expected, f"doc {doc_id} trace mismatch"


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


def test_stem_token_rules_match_python_twin(spark):
    from morphik_core_spark.functions.text import stem_token, stem_token_py

    cases = ["reports", "classes", "summaries", "running", "reported",
             "bus", "pass", "sing", "red", "q3", "files", "en"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.s for r in df.select(stem_token(F.col("t")).alias("s")).collect()]
    assert got == [stem_token_py(c) for c in cases]
    # spot-check the rules themselves
    assert stem_token_py("reports") == "report"
    assert stem_token_py("classes") == "class"
    assert stem_token_py("summaries") == "summari"
    assert stem_token_py("running") == "runn"
    assert stem_token_py("pass") == "pass"  # ss-guard
    assert stem_token_py("bus") == "bus"  # us-guard
    assert stem_token_py("sing") == "sing"  # too short to be a gerund


def test_ts_rank_matches_pg_formula(spark):
    """rank = sum over query lexemes of 0.1*H2(tf)/zeta(2), / n_query."""
    from morphik_core_spark.functions.text import plainto_lexemes, ts_rank

    zeta2 = 1.64493406685
    df = spark.createDataFrame(
        [("x", ["report", "report", "en"]), ("y", ["report", "de"]), ("z", ["misc"])],
        "id string, lex array<string>",
    )
    q = plainto_lexemes("the report en")  # stopword 'the' dropped -> 2 lexemes
    assert q == ["report", "en"]
    got = {r.id: r.rank for r in df.select("id", ts_rank(F.col("lex"), q).alias("rank")).collect()}
    assert got["x"] == pytest.approx((0.1 * 1.25 + 0.1) / zeta2 / 2)
    assert got["y"] == pytest.approx(0.1 / zeta2 / 2)
    assert got["z"] == 0.0


def test_ts_rank_h2_lookup_equals_fold_across_table_edge(spark):
    """The H2 prefix-sum lookup and the exact aggregate fallback must be
    bit-identical at and beyond the table boundary (tf = N-1, N, N+1)."""
    from morphik_core_spark.functions.text import _H2_TABLE_N, ts_rank

    rows = [
        (str(tf), ["q"] * tf)
        for tf in (1, _H2_TABLE_N - 1, _H2_TABLE_N, _H2_TABLE_N + 1, _H2_TABLE_N + 7)
    ]
    df = spark.createDataFrame(rows, "id string, lex array<string>")
    got = {r.id: r.rank for r in df.select("id", ts_rank(F.col("lex"), ["q"]).alias("rank")).collect()}
    zeta2_exact = 1.64493406685
    for tf_s, rank in got.items():
        tf = int(tf_s)
        acc = 0.0
        for j in range(1, tf + 1):
            acc += 1.0 / (j * j)
        assert rank == (acc * (0.1 / zeta2_exact)) / 1.0, tf  # bit-exact, no approx


def test_ts_rank_sql_twin_agrees(spark):
    """DuckDB twin produces the same rank on the same lexeme lists."""
    import duckdb

    from morphik_core_spark.functions.text import (
        plainto_lexemes, stem_token_py, ts_rank, ts_rank_sql, tsvector_lexemes_sql,
    )

    q = plainto_lexemes("quarterly reports")
    assert q == [stem_token_py("quarterly"), "report"]
    sql = (
        "WITH t(id, norm) AS (VALUES ('a', 'quarterly report q3'), ('b', 'the notes')) "
        f"SELECT id, {ts_rank_sql(tsvector_lexemes_sql('norm'), q)} AS rank FROM t ORDER BY id"
    )
    duck = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    df = spark.createDataFrame([("a", "quarterly report q3"), ("b", "the notes")], "id string, norm string")
    from morphik_core_spark.functions.text import tsvector_lexemes

    got = {
        r.id: r.rank
        for r in df.select("id", ts_rank(tsvector_lexemes(F.col("norm")), q).alias("rank")).collect()
    }
    assert got["a"] == pytest.approx(duck["a"], abs=1e-12)
    assert got["b"] == pytest.approx(duck["b"], abs=1e-12)


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


def test_filename_search_uses_stored_lexeme_projection(spark):
    """filename_search ranks from a stored filename_lexemes column when
    present, and results equal the recompute path exactly."""
    from morphik_core_spark.functions.text import filename_search, with_filename_lexemes

    df = spark.createDataFrame(
        [(1, "annual_report.txt"), (2, "notes-misc.txt"), (3, "report-report.txt")],
        "id long, filename string",
    )
    plain = filename_search(df, "report").select("id", "rank").collect()
    stored = filename_search(with_filename_lexemes(df), "report").select("id", "rank").collect()
    assert sorted((r.id, r.rank) for r in plain) == sorted((r.id, r.rank) for r in stored)
    plan = filename_search(with_filename_lexemes(df), "report")._jdf.queryExecution().optimizedPlan().toString()
    assert "filename_lexemes" in plan  # the stored column is what's read
