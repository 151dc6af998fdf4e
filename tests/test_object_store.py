"""Object-store semantics + file-ingestion serving edge: local store,
S3-shaped presigned URLs (HMAC verified), ingest_file through the shared
kernel table, and ChunkResult download_url hydration."""

from __future__ import annotations

import os
import sys

import pytest

from morphik_core_spark.sources.object_store import LocalObjectStore, PresignedStubStore

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_local_store_roundtrip_and_url(tmp_path):
    store = LocalObjectStore(str(tmp_path))
    store.upload("b1", "a/b.txt", b"payload")
    assert store.download("b1", "a/b.txt") == b"payload"
    url = store.get_download_url("b1", "a/b.txt")
    assert url.startswith("file://") and url.endswith("a/b.txt")
    store.delete("b1", "a/b.txt")
    with pytest.raises(FileNotFoundError):
        store.get_download_url("b1", "a/b.txt")


def test_store_rejects_path_escape(tmp_path):
    store = LocalObjectStore(str(tmp_path / "root"))
    with pytest.raises(ValueError, match="escapes"):
        store.upload("b", "../../etc/passwd", b"x")


def test_presigned_stub_signature_roundtrip(tmp_path):
    store = PresignedStubStore(str(tmp_path), secret=b"s3cr3t")
    store.upload("bkt", "k/doc.pdf", b"x")
    url = store.get_download_url("bkt", "k/doc.pdf", expires_in=600)
    assert url.startswith("https://") and "X-Signature=" in url and "X-Expires=600" in url
    assert store.verify_url(url)
    # tampering with any signed component breaks verification
    assert not store.verify_url(url.replace("X-Expires=600", "X-Expires=9999"))
    assert not store.verify_url(url.replace("doc.pdf", "other.pdf"))
    # a different secret cannot verify
    assert not PresignedStubStore(str(tmp_path), secret=b"other").verify_url(url)


def test_ingest_file_parses_stores_and_hydrates_download_url(spark, tmp_path):
    from test_pdf import make_pdf

    from morphik_core_spark.api import MorphikSpark

    store = PresignedStubStore(str(tmp_path / "objects"))
    api = MorphikSpark(spark, str(tmp_path / "m"), storage=store)

    pdf = make_pdf(b"BT /F1 12 Tf 72 720 Td (spark engines shuffle data) Tj ET")
    doc_id = api.ingest_file(pdf, "report.pdf")

    doc = api.get_document(doc_id)
    assert doc["content_type"] == "application/pdf"
    assert doc["status"] == "completed"

    hits = api.retrieve_chunks("spark shuffle", k=1)
    assert hits and hits[0]["document_id"] == doc_id
    url = hits[0]["download_url"]
    assert url and store.verify_url(url)
    # the URL points at the original payload byte-for-byte
    import urllib.parse

    path = urllib.parse.urlparse(url).path.lstrip("/")
    bucket, _, key = path.partition("/")
    assert store.download(bucket, urllib.parse.unquote(key)) == pdf


def test_ingest_file_unparseable_marks_failed_keeps_payload(spark, tmp_path):
    from morphik_core_spark.api import MorphikSpark

    store = LocalObjectStore(str(tmp_path / "objects"))
    api = MorphikSpark(spark, str(tmp_path / "m"), storage=store)
    doc_id = api.ingest_file(b"\x00\x01 not a real pdf", "broken.pdf")
    doc = api.get_document(doc_id)
    assert doc["status"] == "failed"
    # the payload is still stored for later reprocessing
    import json as _json

    info = _json.loads(_json.loads(doc["metadata"])["external_storage"])
    assert store.download(info["bucket"], info["key"]).startswith(b"\x00\x01")


def test_ingest_file_without_storage_has_null_download_url(spark, tmp_path):
    from morphik_core_spark.api import MorphikSpark

    api = MorphikSpark(spark, str(tmp_path / "m"))
    api.ingest_file(b"plain words about joins", "note.txt")
    hits = api.retrieve_chunks("joins", k=1)
    assert hits and hits[0]["download_url"] is None


def test_use_colpali_ingest_and_visual_retrieval(spark, tmp_path):
    """Reference use_colpali=True parity: file ingestion writes page
    multivectors; retrieve_chunks(use_colpali=True) merges MaxSim page
    hits with the text path (visual rows replace same-key text rows)."""
    from test_pdf import make_pdf_pages

    from morphik_core_spark.api import MorphikSpark

    api = MorphikSpark(spark, str(tmp_path / "m"))
    text_a = "quarterly revenue grew nine percent on cloud demand"
    pdf_a = make_pdf_pages([
        b"BT /F1 18 Tf 1 0 0 1 72 720 Tm (" + text_a.encode() + b") Tj ET",
    ])
    pdf_b = make_pdf_pages([b"BT /F1 10 Tf 1 0 0 1 300 200 Tm (tiny footnote) Tj ET"])
    id_a = api.ingest_file(pdf_a, "a.pdf", use_colpali=True)
    id_b = api.ingest_file(pdf_b, "b.pdf", use_colpali=True)
    api.ingest_file(b"plain text, no visual rows", "c.txt", use_colpali=True)

    mv = api.page_multivectors()
    assert {r.document_id for r in mv.collect()} == {id_a, id_b}  # txt adds none

    hits = api.retrieve_chunks("quarterly revenue grew nine percent on cloud demand",
                               k=3, use_colpali=True)
    visual = [h for h in hits if h.get("is_visual")]
    assert visual, "visual page hits must appear in the merged results"
    assert visual[0]["document_id"] == id_a  # layout match ranks first
    assert visual[0]["filename"] == "a.pdf" and visual[0]["content"] is None
    # without the flag the result shape is unchanged (no is_visual key)
    plain = api.retrieve_chunks("quarterly revenue", k=2)
    assert all("is_visual" not in h for h in plain)
