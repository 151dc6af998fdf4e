"""WARC (Web ARChive) source: the Common Crawl ingestion format.

A 100 TB pretraining corpus starts as WARC — gzip-membered archives of
HTTP request/response records. This source parses them Spark-first:

- `read_warc_dir`: binaryFile scan over `*.warc` / `*.warc.gz` →
  `parse_warc_udf` (Arrow-batched mapInPandas, one archive per row,
  row-level failure isolation like every parser here) → one row per
  response record with (url, date, content_type, status, html, text).
- Record-level parsing is `iter_warc_records` — WARC/1.x headers,
  exact Content-Length payloads, per-record gzip members (the Common
  Crawl layout: each record its own deflate stream, so archives split
  cleanly) and whole-file gzip as the fallback.
- HTTP response payloads are split at the header boundary; HTML bodies
  route through `functions/html.extract_html_text` — the same extractor
  the document pipeline uses.

At scale, archives are the parallelism unit (CC ships ~1 GB files — one
task each); no shuffle until the text lands in the documents table. A
fixture writer (`build_warc`) keeps everything testable offline.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from morphik_core_spark.functions.html import extract_html_text

__all__ = ["iter_warc_records", "parse_http_response", "read_warc_dir", "build_warc", "build_wet"]


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    Common Crawl per-record layout)."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(data[pos:])
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from plain or gzip bytes."""
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(data)
        buf = b"".join(chunks)
    else:
        buf = data
    stream = io.BytesIO(buf)
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("WARC record payload truncated")
        yield headers, payload


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """HTTP response block → (status, headers, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        body_at = sep + 2
    else:
        body_at = sep + 4
    if sep < 0:
        raise ValueError("HTTP block without header boundary")
    head = payload[:sep].decode("latin-1", errors="replace").splitlines()
    if not head or not head[0].startswith("HTTP/"):
        raise ValueError("not an HTTP response block")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError) as exc:
        raise ValueError("bad HTTP status line") from exc
    headers = {}
    for h in head[1:]:
        if ":" in h:
            k, v = h.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return status, headers, payload[body_at:]


_SCHEMA = StructType([
    StructField("archive", StringType()),
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("text", StringType()),
    StructField("ok", StringType()),  # NULL when fine, else the error
])


def _records_frame(path: str, data: bytes) -> list[dict]:
    rows: list[dict] = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type")
        # response = raw crawl (WARC); conversion = pre-extracted text
        # (WET — Common Crawl's *.warc.wet.gz companions, plain payload,
        # no HTTP envelope)
        if rtype not in ("response", "conversion"):
            continue
        row = {
            "archive": path,
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "status": None,
            "content_type": None,
            "text": None,
            "ok": None,
        }
        try:
            if rtype == "conversion":
                ctype = headers.get("content-type", "").split(";")[0].strip().lower()
                row["content_type"] = ctype or "text/plain"
                row["text"] = payload.decode("utf-8", errors="replace")
            else:
                status, hh, body = parse_http_response(payload)
                row["status"] = status
                ctype = hh.get("content-type", "").split(";")[0].strip().lower()
                row["content_type"] = ctype or None
                raw = body.decode("utf-8", errors="replace")
                row["text"] = extract_html_text(raw) if "html" in ctype else raw
        except Exception as exc:  # noqa: BLE001 — row-level isolation
            row["ok"] = f"{type(exc).__name__}: {exc}"[:200]
        rows.append(row)
    return rows


def read_warc_dir(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """binaryFile scan → one row per WARC response record.

    A malformed archive yields one error row for the archive (not a
    failed job); a malformed record within a parseable archive yields an
    error row for that record.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            out: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(_records_frame(p, bytes(content)))
                except Exception as exc:  # noqa: BLE001
                    out.append({
                        "archive": p, "url": None, "warc_date": None,
                        "status": None, "content_type": None, "text": None,
                        "ok": f"{type(exc).__name__}: {exc}"[:200],
                    })
            yield pd.DataFrame(out, columns=[f.name for f in _SCHEMA.fields])

    return files.mapInPandas(gen, schema=_SCHEMA)


def build_warc(
    records: list[tuple[str, str, int, str, bytes]],
    per_record_gzip: bool = False,
) -> bytes:
    """Fixture writer: (url, date, status, content_type, body) → WARC
    bytes, optionally gzip-membered per record (the Common Crawl layout)."""
    out = bytearray()
    for url, date, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            "WARC-Record-ID: <urn:uuid:0>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"
        if per_record_gzip:
            out += gzip.compress(bytes(rec))
        else:
            out += rec
    return bytes(out)


def build_wet(records: list[tuple[str, str, str]]) -> bytes:
    """Fixture writer: (url, date, text) → WET bytes (WARC conversion
    records, plain-text payload — the Common Crawl *.wet layout)."""
    out = bytearray()
    for url, date, text in records:
        body = text.encode("utf-8")
        out += (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            "WARC-Record-ID: <urn:uuid:1>\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    return bytes(out)
