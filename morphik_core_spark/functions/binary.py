"""Binary/base64 scalar functions + MIME inference (SURVEY §2.7).

The reference's Rust base64 kernels (morphik_rust/src/base64_ops.rs:19-160,
fast_ops.py:48-95) exist because Python's base64 is slow row-at-a-time;
in Spark the built-in ``base64``/``unbase64`` run inside codegen, so the
"kernel" is just expression composition. MIME/extension inference mirrors
core/storage/utils_file_extensions.py:1-168 as a literal lookup map —
no UDF, constant-folded by Catalyst.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_base64", "from_base64", "to_data_uri", "from_data_uri", "infer_mime", "extension_of"]

# extension → MIME (the subset the reference routes on)
_EXT_MIME = {
    "txt": "text/plain",
    "md": "text/markdown",
    "html": "text/html",
    "htm": "text/html",
    "xml": "application/xml",
    "json": "application/json",
    "csv": "text/csv",
    "pdf": "application/pdf",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "rtf": "application/rtf",
    "eml": "message/rfc822",
    "epub": "application/epub+zip",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "mp3": "audio/mpeg",
    "wav": "audio/wav",
    "mp4": "video/mp4",
    "mov": "video/quicktime",
    "avi": "video/x-msvideo",
}
_DEFAULT_MIME = "application/octet-stream"


def to_base64(col: Column) -> Column:
    return F.base64(col)


def from_base64(col: Column) -> Column:
    return F.unbase64(col)


def to_data_uri(payload: Column, mime: Column | str) -> Column:
    """binary + mime → ``data:<mime>;base64,<payload>`` (reference
    fast_ops.py:75-95 batch data-URI builder)."""
    mime_col = F.lit(mime) if isinstance(mime, str) else mime
    return F.concat(F.lit("data:"), mime_col, F.lit(";base64,"), F.base64(payload))


def from_data_uri(uri: Column) -> Column:
    """data URI → decoded binary payload (NULL if not a data URI)."""
    b64 = F.regexp_extract(uri, r"^data:[^;]*;base64,(.*)$", 1)
    return F.when(F.length(b64) > 0, F.unbase64(b64))


def extension_of(filename: Column) -> Column:
    return F.lower(F.regexp_extract(filename, r"\.([A-Za-z0-9]+)$", 1))


def infer_mime(filename: Column) -> Column:
    """filename → MIME via the literal lookup map; octet-stream fallback."""
    mapping = F.create_map(*list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in _EXT_MIME.items())))
    return F.coalesce(mapping.getItem(extension_of(filename)), F.lit(_DEFAULT_MIME))
