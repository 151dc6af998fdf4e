"""File ingestion source: spark.read.format("binaryFile") → raw-doc rows.

The reference's file-ingest endpoint stages uploads then parses per type
(/root/reference/core/routes/ingest.py:105, ingestion_worker.py:546-588).
Here a staging directory IS the upload surface: ``binaryFile`` gives
(path, modificationTime, length, content) with partition-parallel reads;
MIME routing decides the parser. Text-family types decode for real.

PDF, xlsx, docx, legacy .doc/.xls, and HTML parse for real via the
pure-Python extractors in functions/pdf.py, functions/office.py,
functions/legacy_office.py (CFB + [MS-DOC]/[MS-XLS] record walks), and
functions/html.py; rows they can't handle surface
``parse_status='parse_failed'`` with NULL text — per-row failure
isolation, never a job abort. Remaining binary formats (presentations,
archives) surface ``parse_status='unsupported'``.

Output schema feeds streaming/ingestion.ingest_batch directly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.functions.binary import infer_mime

__all__ = ["read_binary_dir", "files_to_raw_docs"]

_TEXT_MIME_PREFIXES = ("text/",)
_TEXT_MIMES = {"application/json", "application/xml", "text/csv", "text/markdown"}


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _decode_text_udf():
    # built lazily: pandas_udf registration needs an active session
    @F.pandas_udf("string")
    def decode(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)

    return decode


_XLSX_MIME = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
_DOCX_MIME = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
_DOC_MIME = "application/msword"
_XLS_MIME = "application/vnd.ms-excel"
_HTML_MIMES = ("text/html", "application/xhtml+xml")
_PPTX_MIME = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
_ODF_MIMES = (
    "application/vnd.oasis.opendocument.text",
    "application/vnd.oasis.opendocument.spreadsheet",
)
_RTF_MIME = "application/rtf"
_EML_MIME = "message/rfc822"
_EPUB_MIME = "application/epub+zip"
_PARSEABLE_MIMES = (
    "application/pdf", _XLSX_MIME, _DOCX_MIME, _DOC_MIME, _XLS_MIME, *_HTML_MIMES,
    _PPTX_MIME, *_ODF_MIMES, _RTF_MIME, _EML_MIME, _EPUB_MIME,
)


def parse_kernels(pdf_layout: bool = False, pdf_tables: bool = False) -> dict:
    """MIME -> ``bytes -> text`` kernel table — the single routing map
    shared by the distributed parse UDF and the serving edge's one-file
    ``api.ingest_file``. ``pdf_layout=True`` swaps the PDF kernel for the
    layout-aware extractor (functions/pdf_render.extract_pdf_text_layout:
    XY-cut reading order) — the Docling-shaped option for multi-column
    corpora, at ~2x the per-document parse cost. ``pdf_tables=True``
    additionally appends each ruled table as a markdown block after the
    page text (functions/pdf_tables: rule-grid detection + cell fill),
    closing the ruled half of the reference's Docling table model
    (core/parser/morphik_parser.py:295-346)."""
    from morphik_core_spark.functions.html import extract_html_text
    from morphik_core_spark.functions.legacy_office import extract_doc_text, extract_xls_markdown
    from morphik_core_spark.functions.office import extract_docx_text, extract_xlsx_markdown
    from morphik_core_spark.functions.pdf import extract_pdf_text
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    pdf_kernel = extract_pdf_text_layout if pdf_layout else extract_pdf_text
    if pdf_tables:
        from morphik_core_spark.functions.pdf_tables import (
            extract_pdf_tables,
            table_to_markdown,
        )

        base_pdf_kernel = pdf_kernel

        def pdf_kernel(data: bytes) -> str:  # noqa: F811 — deliberate wrap
            text = base_pdf_kernel(data)
            blocks = [table_to_markdown(t) for t in extract_pdf_tables(data)]
            blocks = [b for b in blocks if b]
            return text + ("\n\n" + "\n\n".join(blocks) if blocks else "")

    from morphik_core_spark.functions.docs_extra import (
        extract_eml_text, extract_epub_text, extract_odf_text,
        extract_pptx_text, extract_rtf_text,
    )

    return {
        "application/pdf": pdf_kernel,
        _XLSX_MIME: extract_xlsx_markdown,
        _DOCX_MIME: extract_docx_text,
        _DOC_MIME: extract_doc_text,
        _XLS_MIME: extract_xls_markdown,
        **{m: extract_html_text for m in _HTML_MIMES},
        _PPTX_MIME: extract_pptx_text,
        **{m: extract_odf_text for m in _ODF_MIMES},
        _RTF_MIME: extract_rtf_text,
        _EML_MIME: extract_eml_text,
        _EPUB_MIME: extract_epub_text,
    }


def _parse_document_udf(pdf_layout: bool = False, pdf_tables: bool = False):
    """Arrow-batched document parse with per-row failure isolation: routes
    on MIME inside the batch (PDF / xlsx-markdown / docx) and returns a
    (text, status) struct; a row that fails to parse becomes
    (NULL, 'parse_failed') instead of failing the batch — the same
    isolation contract as the reference worker's per-file try/except
    (ingestion_worker.py:546-588)."""
    kernels = parse_kernels(pdf_layout, pdf_tables)

    @F.pandas_udf("text string, status string")
    def parse(payloads: pd.Series, mimes: pd.Series) -> pd.DataFrame:
        texts: list[str | None] = []
        statuses: list[str] = []
        for b, mime in zip(payloads, mimes):
            kernel = kernels.get(mime)
            if b is None or kernel is None:
                texts.append(None)
                statuses.append("unsupported")
                continue
            try:
                texts.append(kernel(bytes(b)))
                statuses.append("ok")
            except Exception:
                texts.append(None)
                statuses.append("parse_failed")
        return pd.DataFrame({"text": texts, "status": statuses})

    return parse


def _decompress_udf():
    """Transparent .gz/.bz2/.xz/.lz4/.snappy unwrap (stdlib codecs + the pure-
    Python LZ4 frame decoder); a corrupt archive yields NULL content →
    the row lands in parse_failed, never the task."""
    import bz2
    import gzip
    import lzma

    from morphik_core_spark.functions.lz4 import decompress_lz4_frame
    from morphik_core_spark.functions.snappy import (
        decompress_snappy_block,
        decompress_snappy_framed,
    )

    @F.pandas_udf("binary")
    def dec(payloads: pd.Series, codecs: pd.Series) -> pd.Series:
        out = []
        for b, c in zip(payloads, codecs):
            if b is None or c is None:
                out.append(b)
                continue
            try:
                if c == "gzip":
                    out.append(gzip.decompress(bytes(b)))
                elif c == "bz2":
                    out.append(bz2.decompress(bytes(b)))
                elif c == "lz4":
                    out.append(decompress_lz4_frame(bytes(b)))
                elif c == "snappy":
                    raw = bytes(b)
                    # framed stream or a bare raw block — both ship as
                    # .snappy in the wild; sniff the stream identifier
                    if raw.startswith(b"\xff\x06\x00\x00sNaPpY"):
                        out.append(decompress_snappy_framed(raw))
                    else:
                        out.append(decompress_snappy_block(raw))
                else:
                    out.append(lzma.decompress(bytes(b)))
            except Exception:  # noqa: BLE001
                out.append(None)
        return pd.Series(out)

    return dec


def files_to_raw_docs(
    files: DataFrame,
    app_id: str | None = None,
    folder_path: str | None = None,
    pdf_layout: bool = False,
    pdf_tables: bool = False,
) -> DataFrame:
    """binaryFile rows → raw-doc rows for ingest_batch.

    parse_status: 'ok' (decoded), 'unsupported' (needs an external parser),
    'empty'. Unsupported/empty rows keep NULL text so ingest_batch marks
    them failed — same row-level isolation as the reference worker.
    Compressed documents (.gz/.bz2/.xz/.lz4/.snappy wrapper over any
    supported type) unwrap transparently before MIME routing.
    """
    outer_name = F.element_at(F.split(F.col("path"), "/"), -1)
    codec = (
        F.when(outer_name.endswith(".gz"), F.lit("gzip"))
        .when(outer_name.endswith(".bz2"), F.lit("bz2"))
        .when(outer_name.endswith(".xz"), F.lit("xz"))
        .when(outer_name.endswith(".lz4"), F.lit("lz4"))
        .when(outer_name.endswith(".snappy"), F.lit("snappy"))
    )
    filename = F.when(
        codec.isNotNull(), F.regexp_replace(outer_name, r"\.(gz|bz2|xz|lz4|snappy)$", "")
    ).otherwise(outer_name)
    files = files.withColumn(
        "content",
        F.when(codec.isNotNull(), _decompress_udf()(F.col("content"), codec)).otherwise(
            F.col("content")
        ),
    )
    mime = infer_mime(filename)
    is_text = F.lit(False)
    for p in _TEXT_MIME_PREFIXES:
        is_text = is_text | mime.startswith(p)
    is_text = is_text | mime.isin(*_TEXT_MIMES)
    # html is text-prefixed but routes through the tag-stripping extractor
    is_text = is_text & ~mime.isin(*_HTML_MIMES)
    is_parseable = mime.isin(*_PARSEABLE_MIMES)
    nonempty = F.length("content") > 0

    # stage the parse struct in its own projection so the Arrow UDF runs
    # once per row even though text and status both read it; the UDF
    # catches its own failures so a bad payload can never abort the stage
    staged = files.withColumn(
        "_parsed",
        F.when(
            is_parseable & nonempty,
            _parse_document_udf(pdf_layout, pdf_tables)(F.col("content"), mime),
        ),
    )

    parse_status = (
        # NULL content only arises from a failed decompression (binaryFile
        # itself always yields bytes)
        F.when(F.col("content").isNull(), "parse_failed")
        .when(F.length("content") == 0, "empty")
        .when(is_text, "ok")
        .when(is_parseable, F.coalesce(F.col("_parsed.status"), F.lit("parse_failed")))
        .otherwise("unsupported")
    )
    return staged.select(
        F.col("path").alias("external_id"),
        filename.alias("filename"),
        mime.alias("content_type"),
        F.when(is_text & nonempty, _decode_text_udf()(F.col("content")))
        .when(is_parseable & nonempty, F.col("_parsed.text"))
        .alias("text"),
        F.lit(None).cast("string").alias("metadata"),
        F.lit(app_id).alias("app_id"),
        F.lit(folder_path).alias("folder_path"),
        parse_status.alias("parse_status"),
    )
