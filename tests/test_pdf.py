"""Pure-Python PDF extraction: format subset + Spark ingest end-to-end."""

from __future__ import annotations

import os
import zlib

import pytest

from morphik_core_spark.functions.pdf import extract_pdf_text, looks_like_pdf


def make_pdf(content_ops: bytes, compress: bool = False) -> bytes:
    """A minimal single-page PDF around the given content-stream bytes."""
    if compress:
        stream = zlib.compress(content_ops)
        filt = b"/Filter /FlateDecode "
    else:
        stream, filt = content_ops, b""
    return b"".join(
        [
            b"%PDF-1.4\n",
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> /MediaBox [0 0 612 792] >> endobj\n",
            b"4 0 obj << " + filt + b"/Length " + str(len(stream)).encode() + b" >> stream\n",
            stream,
            b"\nendstream endobj\n",
            b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
            b"trailer << /Root 1 0 R >>\n%%EOF\n",
        ]
    )


BASIC_OPS = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 Td (Second line) Tj ET"


def test_uncompressed_pdf():
    text = extract_pdf_text(make_pdf(BASIC_OPS))
    assert text == "Hello World\nSecond line"


def test_flate_pdf():
    text = extract_pdf_text(make_pdf(BASIC_OPS, compress=True))
    assert text == "Hello World\nSecond line"


def test_escapes_and_nesting():
    ops = rb"BT (Paren \( quote \\ octal \101) Tj T* (nested (parens) ok) Tj ET"
    text = extract_pdf_text(make_pdf(ops))
    assert text == "Paren ( quote \\ octal A\nnested (parens) ok"


def test_tj_array_and_hex():
    ops = b"BT [(Hel) -20 (lo)] TJ T* <576F726C64> Tj ET"
    text = extract_pdf_text(make_pdf(ops))
    assert text == "Hello\nWorld"


def test_quote_operators_break_lines():
    ops = b"BT (first) Tj (second) ' ET"
    assert extract_pdf_text(make_pdf(ops)) == "first\nsecond"


def test_utf16_string():
    s = "﻿Café".encode("utf-16-be")
    ops = b"BT (" + s + b") Tj ET"
    assert extract_pdf_text(make_pdf(ops)) == "Café"


def test_non_pdf_raises():
    assert not looks_like_pdf(b"plain text")
    with pytest.raises(ValueError):
        extract_pdf_text(b"plain text not a pdf")


def test_textless_pdf_raises():
    with pytest.raises(ValueError):
        extract_pdf_text(make_pdf(b"q 1 0 0 1 0 0 cm Q"))  # no BT block


def test_pdf_ingest_end_to_end(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir
    from morphik_core_spark.streaming.ingestion import ingest_batch

    d = tmp_path / "drop"
    d.mkdir()
    body = " ".join(f"w{i}" for i in range(200)).encode()
    (d / "good.pdf").write_bytes(make_pdf(b"BT (" + body + b") Tj ET", compress=True))
    (d / "note.txt").write_bytes(b"plain text file")
    (d / "broken.pdf").write_bytes(b"%PDF-1.4 garbage with no streams")

    raw = files_to_raw_docs(read_binary_dir(spark, str(d)), app_id="app1")
    by_name = {r.filename: r for r in raw.collect()}
    assert by_name["good.pdf"].parse_status == "ok"
    assert by_name["good.pdf"].text.startswith("w0 w1 ")
    assert by_name["note.txt"].parse_status == "ok"
    assert by_name["broken.pdf"].parse_status == "parse_failed"
    assert by_name["broken.pdf"].text is None

    documents, chunks = ingest_batch(raw.drop("parse_status"), chunk_size=256, chunk_overlap=16)
    status = {r.external_id.rsplit("/", 1)[-1]: r.status for r in documents.collect()}
    assert status["good.pdf"] == "completed"
    assert status["broken.pdf"] == "failed"
    pdf_chunks = chunks.filter(chunks.document_id.endswith("good.pdf")).collect()
    assert len(pdf_chunks) > 1  # 1000+ chars at size 256 → real chunking
    assert all(len(c.embedding) == 16 for c in pdf_chunks)
