"""Minimal pure-Python PDF text extraction (stdlib only).

Closes the reference's core ingest path (morphik_parser.py:295-346 routes
PDFs through Docling/unstructured; ingestion_worker.py:546-588 runs it per
file) without external parser libraries: this container has none, so the
extractor handles the common simple-PDF subset for real and reports
everything else honestly as a parse failure.

Supported:
- uncompressed and FlateDecode content streams (zlib)
- literal strings incl. nested parens, escape sequences, octal escapes
- hex strings (<...>), UTF-16BE strings (BOM-detected)
- text operators Tj, TJ (arrays), ' and " (with line breaks)
- line layout from Td/TD/T*/ET → newlines

Not supported (returns whatever it can, or raises ValueError when nothing
decodes): CID/Type0 composite fonts with custom CMaps (bytes are not
character codes there), LZW/DCT/other filters, encrypted PDFs. A real
deployment swaps :func:`extract_pdf_text` for a PyMuPDF/Docling kernel —
the Spark plumbing in sources/binary.py is identical either way.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "looks_like_pdf"]

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def looks_like_pdf(data: bytes | None) -> bool:
    return bool(data) and data[:5] == b"%PDF-"


def _decode_string_bytes(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:
            pass
    # PDFDocEncoding / WinAnsi agree with latin-1 on the printable range
    return raw.decode("latin-1", errors="replace")


def _parse_literal_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse from the byte after '(' to the matching ')'; returns (text, next_i)."""
    out = bytearray()
    depth = 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                for _ in range(3):
                    if i < n and 0x30 <= buf[i] <= 0x37:
                        val = val * 8 + (buf[i] - 0x30)
                        i += 1
                    else:
                        break
                out.append(val & 0xFF)
                continue
            if e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
                continue
            mapped = _ESCAPES.get(e)
            if mapped is not None:
                out.extend(mapped.encode("latin-1"))
            else:
                out.append(e)
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return _decode_string_bytes(bytes(out)), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return _decode_string_bytes(bytes(out)), i


_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _extract_from_content(content: bytes) -> str:
    """One pass over a content stream: collect show-text strings, map the
    line-positioning operators to newlines."""
    out: list[str] = []
    pending: list[str] = []
    i, n = 0, len(content)

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            s, i = _parse_literal_string(content, i + 1)
            pending.append(s)
        elif c == 0x3C and not content.startswith(b"<<", i):  # <hex>
            end = content.find(b">", i + 1)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(_decode_string_bytes(bytes.fromhex(hx.decode("ascii"))))
            except ValueError:
                pass
            i = end + 1
        elif 0x41 <= (c | 0x20) <= 0x7A or c in (0x27, 0x22):  # operator-ish
            m = _OP_RE.match(content, i)
            op = m.group(0) if m else b""
            i = m.end() if m else i + 1
            if op in (b"Tj",):
                out.extend(pending)
                pending.clear()
            elif op == b"TJ":
                out.extend(pending)
                pending.clear()
            elif op in (b"'", b'"'):
                newline()
                out.extend(pending)
                pending.clear()
            elif op in (b"Td", b"TD", b"T*"):
                newline()
            elif op == b"ET":
                pending.clear()
                newline()
        else:
            i += 1
    return "".join(out)


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text. Raises ValueError when the input is not
    a PDF or yields no text (encrypted, image-only, CID-encoded, or an
    unsupported filter) so callers can mark the row parse_failed instead
    of silently indexing an empty document."""
    if not looks_like_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    parts: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        stream = None
        for candidate in (raw, raw.rstrip(b"\r\n")):
            try:
                stream = zlib.decompress(candidate)
                break
            except zlib.error:
                continue
        if stream is None:
            stream = raw  # uncompressed (or an unsupported filter — no BT, skipped)
        if b"BT" in stream:
            extracted = _extract_from_content(stream)
            if extracted.strip():
                parts.append(extracted.strip("\n"))
    text = "\n".join(parts).strip()
    if not text:
        raise ValueError("no extractable text (encrypted/image-only/unsupported encoding)")
    return text
