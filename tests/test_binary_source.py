"""binaryFile ingest source: MIME routing + pipeline handoff."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir
from morphik_core_spark.streaming.ingestion import ingest_batch


def test_binary_dir_to_ingest(spark, tmp_path):
    d = tmp_path / "stage"
    d.mkdir()
    (d / "notes.txt").write_text("alpha beta gamma " * 30)
    (d / "data.json").write_text('{"k": 1}')
    (d / "scan.pdf").write_bytes(b"%PDF-1.4 fake binary content")
    (d / "empty.txt").write_text("")

    files = read_binary_dir(spark, str(d))
    raw = files_to_raw_docs(files, app_id="app1", folder_path="/stage")
    rows = {r.filename: r for r in raw.collect()}

    assert rows["notes.txt"].parse_status == "ok" and rows["notes.txt"].text.startswith("alpha")
    assert rows["data.json"].parse_status == "ok"
    # PDFs now route to the real extractor; this one has no text streams →
    # per-row parse failure, not a silent 'unsupported'
    assert rows["scan.pdf"].parse_status == "parse_failed" and rows["scan.pdf"].text is None
    assert rows["scan.pdf"].content_type == "application/pdf"
    # NB: spark's binaryFile source silently SKIPS zero-byte files
    assert "empty.txt" not in rows

    documents, chunks = ingest_batch(raw.drop("parse_status"), chunk_size=100, chunk_overlap=10)
    status = {r.filename: r.status for r in documents.collect()}
    assert status["notes.txt"] == "completed"
    assert status["scan.pdf"] == "failed"  # unsupported → failed, job survives
    assert chunks.filter(F.col("document_id").endswith("notes.txt")).count() > 1


def test_glob_filter(spark, tmp_path):
    d = tmp_path / "stage2"
    d.mkdir()
    (d / "a.txt").write_text("x")
    (d / "b.csv").write_text("y")
    only_txt = read_binary_dir(spark, str(d), glob="*.txt")
    assert only_txt.count() == 1


def test_compressed_documents_unwrap_transparently(spark, tmp_path):
    import bz2
    import gzip
    import lzma

    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    (tmp_path / "a.txt.gz").write_bytes(gzip.compress(b"gz body text"))
    (tmp_path / "b.txt.bz2").write_bytes(bz2.compress(b"bz2 body text"))
    (tmp_path / "c.md.xz").write_bytes(lzma.compress(b"# xz markdown"))
    (tmp_path / "plain.txt").write_bytes(b"uncompressed")
    (tmp_path / "broken.txt.gz").write_bytes(b"\x1f\x8bnot really gzip")
    out = {r["filename"]: r for r in files_to_raw_docs(read_binary_dir(spark, str(tmp_path))).collect()}
    assert out["a.txt"]["text"] == "gz body text" and out["a.txt"]["parse_status"] == "ok"
    assert out["b.txt"]["text"] == "bz2 body text"
    assert out["c.md"]["text"] == "# xz markdown"
    assert out["plain.txt"]["parse_status"] == "ok"
    assert out["broken.txt"]["parse_status"] == "parse_failed" and out["broken.txt"]["text"] is None
    # MIME is inferred from the INNER name
    assert out["a.txt"]["content_type"] == "text/plain"


def test_compressed_pdf_routes_through_parser(spark, tmp_path):
    import gzip

    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    pdf = b"%PDF-1.4\n<</Length 20>>\nstream\nBT (compressed pdf text) Tj ET\nendstream\n%%EOF"
    (tmp_path / "doc.pdf.gz").write_bytes(gzip.compress(pdf))
    [row] = files_to_raw_docs(read_binary_dir(spark, str(tmp_path))).collect()
    assert row["parse_status"] == "ok"
    assert "compressed pdf text" in row["text"]


def test_pdf_layout_option_reorders_columns(spark, tmp_path):
    """files_to_raw_docs(pdf_layout=True) routes PDFs through the XY-cut
    layout extractor; default stays show-operator order."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pdf import make_pdf_pages

    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    ops = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 700 Tm (L1) Tj 1 0 0 1 350 700 Tm (R1) Tj "
        b"1 0 0 1 72 684 Tm (L2) Tj 1 0 0 1 350 684 Tm (R2) Tj ET"
    )
    d = tmp_path / "drop"
    d.mkdir()
    (d / "cols.pdf").write_bytes(make_pdf_pages([ops]))
    files = read_binary_dir(spark, str(d))
    default = files_to_raw_docs(files).select("text").first()["text"]
    layout = files_to_raw_docs(files, pdf_layout=True).select("text").first()["text"]
    assert layout.splitlines() == ["L1", "L2", "R1", "R2"]
    assert default.splitlines() != layout.splitlines()  # show order interleaves
