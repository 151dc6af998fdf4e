"""WARC source: record iteration (plain + per-record gzip), HTTP
splitting, HTML extraction, Spark mapInPandas path with row isolation."""

from __future__ import annotations

import gzip

import pytest

from morphik_core_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_http_response,
    read_warc_dir,
)

RECORDS = [
    ("http://a.example/page", "2026-01-01T00:00:00Z", 200, "text/html",
     b"<html><head><title>T</title><script>no()</script></head>"
     b"<body><p>Hello crawl</p><p>Second para</p></body></html>"),
    ("http://b.example/data.txt", "2026-01-02T00:00:00Z", 200, "text/plain",
     b"plain text body"),
    ("http://c.example/404", "2026-01-03T00:00:00Z", 404, "text/html",
     b"<html><body>gone</body></html>"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_iter_records_both_layouts(gz):
    data = build_warc(RECORDS, per_record_gzip=gz)
    recs = list(iter_warc_records(data))
    assert len(recs) == 3
    urls = [h["warc-target-uri"] for h, _ in recs]
    assert urls == [r[0] for r in RECORDS]
    status, headers, body = parse_http_response(recs[1][1])
    assert status == 200 and headers["content-type"] == "text/plain"
    assert body == b"plain text body"


def test_whole_file_gzip():
    data = gzip.compress(build_warc(RECORDS))
    assert len(list(iter_warc_records(data))) == 3


def test_read_warc_dir_extracts_text(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(build_warc(RECORDS, per_record_gzip=True))
    (tmp_path / "b.warc").write_bytes(build_warc(RECORDS[:1]))
    (tmp_path / "broken.warc").write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    df = read_warc_dir(spark, str(tmp_path))
    rows = df.collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    # 3 + 1 records + 1 archive-error row
    assert len(rows) == 5
    good = by_url["http://a.example/page"][0]
    assert good["status"] == 200 and good["content_type"] == "text/html"
    assert "Hello crawl" in good["text"] and "no()" not in good["text"]
    assert by_url["http://b.example/data.txt"][0]["text"] == "plain text body"
    err_rows = [r for r in rows if r["ok"] is not None]
    assert len(err_rows) == 1 and "broken.warc" in err_rows[0]["archive"]


def test_pipeline_feeds_curation(spark, tmp_path):
    """WARC → text column → the standard curation ops run unchanged."""
    from pyspark.sql import functions as F

    from morphik_core_spark.operators.text_analysis import text_stats

    (tmp_path / "a.warc").write_bytes(build_warc(RECORDS))
    docs = (
        read_warc_dir(spark, str(tmp_path))
        .filter(F.col("ok").isNull() & (F.col("status") == 200))
        .select(F.col("url").alias("doc_id"), "text")
    )
    out = text_stats(docs, "text", "doc_id").collect()
    assert len(out) == 2 and all(r["token_cnt"] > 0 for r in out)


def test_read_wet_conversion_records(spark, tmp_path):
    from morphik_core_spark.sources.warc import build_wet, read_warc_dir

    wet = build_wet(
        [
            ("http://a.example/x", "2024-01-01T00:00:00Z", "pre extracted text one"),
            ("http://b.example/y", "2024-01-01T00:00:01Z", "another wet record"),
        ]
    )
    p = tmp_path / "crawl-00000.warc.wet"
    p.write_bytes(wet)
    out = read_warc_dir(spark, str(tmp_path), glob="*.wet").collect()
    got = {r.url: r for r in out}
    assert got["http://a.example/x"].text == "pre extracted text one"
    assert got["http://a.example/x"].content_type == "text/plain"
    assert got["http://a.example/x"].status is None  # no HTTP envelope in WET
    assert got["http://b.example/y"].ok is None
