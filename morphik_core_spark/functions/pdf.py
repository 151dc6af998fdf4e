"""Minimal pure-Python PDF text extraction (stdlib only).

Closes the reference's core ingest path (morphik_parser.py:295-346 routes
PDFs through Docling/unstructured; ingestion_worker.py:546-588 runs it per
file) without external parser libraries: this container has none, so the
extractor handles the common simple-PDF subset for real and reports
everything else honestly as a parse failure.

Supported:
- uncompressed, FlateDecode, LZWDecode, ASCIIHexDecode, ASCII85Decode,
  and RunLengthDecode content streams (chained filters honored)
- literal strings incl. nested parens, escape sequences, octal escapes
- hex strings (<...>), UTF-16BE strings (BOM-detected)
- text operators Tj, TJ (arrays), ' and " (with line breaks)
- line layout from Td/TD/T*/ET → newlines
- CID/Type0 (Identity-H) fonts WITH a /ToUnicode CMap: Tf font tracking
  routes 2-byte CID codes through the parsed bfchar/bfrange tables

Embedded raster images decode for real via :func:`extract_pdf_images`
(DCTDecode through the JPEG codec, Flate/raw RGB+Gray bitmaps) — the
scanned-PDF page-image path without a rasterizer.

Not supported (returns whatever it can, or raises ValueError when nothing
decodes): CID fonts WITHOUT a ToUnicode map (their bytes genuinely are
not character codes), encrypted PDFs, vector-page rasterization. A real
deployment swaps :func:`extract_pdf_text` for a PyMuPDF/Docling kernel —
the Spark plumbing in sources/binary.py is identical either way.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "extract_pdf_images", "apply_stream_filters", "looks_like_pdf"]

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


def _parse_literal_bytes(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse from the byte after '(' to the matching ')'; returns (raw, next_i)."""
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
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_literal_string(buf: bytes, i: int) -> tuple[str, int]:
    raw, j = _parse_literal_bytes(buf, i)
    return _decode_string_bytes(raw), j


_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


_NAME_TOKEN_RE = re.compile(rb"/([A-Za-z0-9.+_-]+)")


def _cmap_decode(raw: bytes, cmap: dict) -> str:
    """2-byte CID codes (Identity-H convention) → unicode via ToUnicode."""
    out = []
    for k in range(0, len(raw) - 1, 2):
        code = (raw[k] << 8) | raw[k + 1]
        got = cmap.get(code)
        if got is not None:
            out.append(got)
    return "".join(out)


def _extract_from_content(content: bytes, font_cmaps: dict | None = None) -> str:
    """One pass over a content stream: collect show-text strings, map the
    line-positioning operators to newlines. ``font_cmaps`` maps resource
    font names (from Tf) to ToUnicode tables; strings shown under such a
    font decode as 2-byte CID codes instead of byte characters."""
    out: list[str] = []
    pending: list[bytes] = []
    cur_cmap: dict | None = None
    last_name: str | None = None
    i, n = 0, len(content)

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    def show() -> None:
        for raw in pending:
            out.append(_cmap_decode(raw, cur_cmap) if cur_cmap else _decode_string_bytes(raw))
        pending.clear()

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            raw, i = _parse_literal_bytes(content, i + 1)
            pending.append(raw)
        elif c == 0x2F:  # /Name token (tracked for Tf)
            m = _NAME_TOKEN_RE.match(content, i)
            if m:
                last_name = m.group(1).decode("latin-1")
                i = m.end()
            else:
                i += 1
        elif c == 0x3C and not content.startswith(b"<<", i):  # <hex>
            end = content.find(b">", i + 1)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = end + 1
        elif 0x41 <= (c | 0x20) <= 0x7A or c in (0x27, 0x22):  # operator-ish
            m = _OP_RE.match(content, i)
            op = m.group(0) if m else b""
            i = m.end() if m else i + 1
            if op in (b"Tj", b"TJ"):
                show()
            elif op in (b"'", b'"'):
                newline()
                show()
            elif op == b"Tf":
                cur_cmap = (font_cmaps or {}).get(last_name)
            elif op in (b"Td", b"TD", b"T*"):
                newline()
            elif op == b"ET":
                pending.clear()
                newline()
        else:
            i += 1
    return "".join(out)


def _iter_text_streams(data: bytes):
    """Decoded content streams that contain a BT text block, in document
    order. Streams WITH a dict go through the declared filter chain
    (Flate, LZW, ASCIIHex/85, RunLength); dict-less matches fall back to
    the try-zlib-else-raw heuristic."""
    covered: set[int] = set()
    for dict_body, raw, span in _iter_dict_streams_spans(data):
        covered.add(span)
        filters = _stream_filters(dict_body)
        try:
            if filters:
                stream = apply_stream_filters(raw, filters)
            else:
                try:
                    stream = zlib.decompress(raw)
                except zlib.error:
                    stream = raw
        except ValueError:
            continue  # unsupported filter: no text in this stream
        if b"BT" in stream:
            yield stream
    for m in _STREAM_RE.finditer(data):
        if m.start(1) in covered:
            continue
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
            yield stream


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text. Standard-handler encrypted documents
    (RC4 / AES-128, empty user password — the owner-locked kind) are
    decrypted transparently via functions/pdf_crypt. Raises ValueError
    when the input is not a PDF or yields no text (password-protected,
    image-only, CID-encoded, or an unsupported filter) so callers can
    mark the row parse_failed instead of silently indexing an empty
    document."""
    if not looks_like_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    from morphik_core_spark.functions.pdf_crypt import decrypt_pdf

    data = decrypt_pdf(data)
    parts: list[str] = []
    font_cmaps = _collect_font_cmaps(data)
    for stream in _iter_text_streams(data):
        extracted = _extract_from_content(stream, font_cmaps)
        if extracted.strip():
            parts.append(extracted.strip("\n"))
    text = "\n".join(parts).strip()
    if not text:
        raise ValueError("no extractable text (encrypted/image-only/unsupported encoding)")
    return text


# --------------------------------------------------- stream filters / images

_DICT_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|\s*/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def _stream_filters(dict_body: bytes) -> list[str]:
    m = _FILTER_RE.search(dict_body)
    if not m:
        return []
    if m.group(2):
        return [m.group(2).decode("latin-1")]
    return [n.decode("latin-1") for n in _NAME_RE.findall(m.group(1))]


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 128:
            break
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        else:
            out += data[i : i + 1] * (257 - c)
            i += 1
    return bytes(out)


def apply_stream_filters(raw: bytes, filters: list[str]) -> bytes:
    """Chain-apply the PDF stream filters this subset implements. The
    image filters (DCTDecode) pass through — callers hand those bytes to
    the matching codec."""
    import base64
    import binascii

    data = raw
    for f in filters:
        if f in ("FlateDecode", "Fl"):
            for candidate in (data, data.rstrip(b"\r\n")):
                try:
                    data = zlib.decompress(candidate)
                    break
                except zlib.error:
                    continue
            else:
                raise ValueError("bad FlateDecode stream")
        elif f in ("LZWDecode", "LZW"):
            from morphik_core_spark.functions.tiff import _lzw_decode_tiff

            data = _lzw_decode_tiff(data.rstrip(b"\r\n"), None)
        elif f in ("ASCIIHexDecode", "AHx"):
            h = data.split(b">")[0]
            h = re.sub(rb"\s+", b"", h)
            if len(h) % 2:
                h += b"0"
            data = binascii.unhexlify(h)
        elif f in ("ASCII85Decode", "A85"):
            body = data
            if body.lstrip().startswith(b"<~"):
                body = body.lstrip()[2:]
            end = body.find(b"~>")
            if end >= 0:
                body = body[:end]
            body = re.sub(rb"\s+", b"", body)
            data = base64.a85decode(b"<~" + body + b"~>", adobe=True)
        elif f in ("DCTDecode", "DCT"):
            return data  # JPEG bytes — decoded by the image path
        elif f == "RunLengthDecode":
            data = _runlength_decode(data)
        else:
            raise ValueError(f"unsupported PDF stream filter {f}")
    return data


def _iter_dict_streams(data: bytes):
    """Yield (dict_body, stream_bytes) for each <<...>> stream pair."""
    for m in _DICT_STREAM_RE.finditer(data):
        end = data.find(b"endstream", m.end())
        if end < 0:
            continue
        yield m.group(1), data[m.end() : end].rstrip(b"\r\n")


def extract_pdf_images(data: bytes) -> list:
    """Decode the embedded raster images (XObject /Image): DCTDecode
    streams through the JPEG codec, Flate/raw RGB+Gray bitmaps directly.

    This is the real substance of the reference's PDF page-image path
    (`document_service.py:1901-2011` renders pages for ColPali): scanned
    PDFs — the corpus case that actually needs page images — store each
    page AS an embedded DCT image, so extraction covers them without a
    rasterizer. Vector-only pages still have no image to give; that
    boundary is documented in COVERAGE.md.

    Returns a list of (H, W, 3) uint8 arrays; undecodable images are
    skipped (callers treat absence, not errors — same contract as the
    reference's best-effort page rendering).
    """
    from morphik_core_spark.functions.pdf_crypt import decrypt_pdf

    data = decrypt_pdf(data)
    import numpy as np

    if not looks_like_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    out = []
    for dict_body, raw in _iter_dict_streams(data):
        if b"/Subtype" not in dict_body or b"/Image" not in dict_body:
            continue
        filters = _stream_filters(dict_body)
        try:
            payload = apply_stream_filters(raw, filters)
            if filters and filters[-1] in ("DCTDecode", "DCT"):
                from morphik_core_spark.functions.jpeg import decode_jpeg

                out.append(decode_jpeg(payload))
                continue
            wm = re.search(rb"/Width\s+(\d+)", dict_body)
            hm = re.search(rb"/Height\s+(\d+)", dict_body)
            bm = re.search(rb"/BitsPerComponent\s+(\d+)", dict_body)
            if not (wm and hm) or (bm and bm.group(1) != b"8"):
                continue
            w, h = int(wm.group(1)), int(hm.group(1))
            if b"/DeviceRGB" in dict_body and len(payload) >= w * h * 3:
                out.append(np.frombuffer(payload[: w * h * 3], dtype=np.uint8).reshape(h, w, 3))
            elif b"/DeviceGray" in dict_body and len(payload) >= w * h:
                g = np.frombuffer(payload[: w * h], dtype=np.uint8).reshape(h, w)
                out.append(np.repeat(g[:, :, None], 3, axis=2))
        except Exception:  # noqa: BLE001 — best-effort, skip bad images
            continue
    return out


def _iter_dict_streams_spans(data: bytes):
    """Like _iter_dict_streams but also yields the payload start offset
    (aligned with _STREAM_RE.start(1)) so the legacy fallback can skip
    already-handled streams."""
    for m in _DICT_STREAM_RE.finditer(data):
        end = data.find(b"endstream", m.end())
        if end < 0:
            continue
        yield m.group(1), data[m.end() : end].rstrip(b"\r\n"), m.end()


# ----------------------------------------------------- CID fonts / ToUnicode

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE3_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE_ARR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", re.DOTALL)
_HEX1_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16_hex(h: bytes) -> str:
    raw = bytes.fromhex(h.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", errors="replace")


def parse_tounicode_cmap(data: bytes) -> dict:
    """ToUnicode CMap stream → {CID code: unicode string} (bfchar +
    bfrange incl. the array destination form)."""
    mapping: dict[int, str] = {}
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        for lo, hi, arr in _RANGE_ARR_RE.findall(body):
            for k, d in enumerate(_HEX1_RE.findall(arr)):
                mapping[int(lo, 16) + k] = _utf16_hex(d)
        body_no_arr = _RANGE_ARR_RE.sub(b"", body)
        for lo, hi, dst in _RANGE3_RE.findall(body_no_arr):
            base = int(dst, 16)
            for c in range(int(lo, 16), int(hi, 16) + 1):
                mapping[c] = chr(base + (c - int(lo, 16)))
    for m in _BFCHAR_RE.finditer(data):
        for src, dst in _HEXPAIR_RE.findall(m.group(1)):
            mapping[int(src, 16)] = _utf16_hex(dst)
    return mapping


def _collect_font_cmaps(data: bytes) -> dict:
    """{resource font name: ToUnicode mapping} for the document's CID
    fonts — the subset needed to read Identity-H text: every font object
    carrying /ToUnicode gets its CMap stream decoded (honoring stream
    filters), and resource names pointing at that font object bind to it
    (last binding wins across pages). Font dicts packed inside PDF 1.5+
    /ObjStm object streams are visible too (pdf_render._parse_objects
    inflates them); their ToUnicode CMap streams are always direct
    objects, so the stream lookup below needs no change."""
    from morphik_core_spark.functions.pdf_render import _parse_objects

    objects: dict[int, bytes] = _parse_objects(data)
    cmaps_by_font_obj: dict[int, dict] = {}
    for objnum, body in objects.items():
        if b"/Font" not in body and b"/Type0" not in body:
            continue
        m = _TOUNI_RE.search(body)
        if not m:
            continue
        cm_obj = objects.get(int(m.group(1)))
        if cm_obj is None:
            continue
        try:
            for dict_body, raw, _span in _iter_dict_streams_spans(cm_obj):
                stream = apply_stream_filters(raw, _stream_filters(dict_body)) if _stream_filters(dict_body) else raw
                cmaps_by_font_obj[objnum] = parse_tounicode_cmap(stream)
                break
            else:
                # stream may sit directly in the object without our dict regex
                sm = _STREAM_RE.search(cm_obj)
                if sm:
                    raw = sm.group(1)
                    try:
                        raw = zlib.decompress(raw)
                    except zlib.error:
                        pass
                    cmaps_by_font_obj[objnum] = parse_tounicode_cmap(raw)
        except ValueError:
            continue
    out: dict[str, dict] = {}
    # resource dicts binding names to font objects may themselves be
    # packed in an ObjStm — scan the raw file AND the unpacked bodies
    # (direct bodies are substrings of data; re-scanning them would just
    # double the per-document regex cost, so only packed ones are added)
    direct = {int(m.group(1)) for m in _OBJ_RE.finditer(data)}
    spaces = [data, *(b for num, b in objects.items() if num not in direct)]
    for objnum, cmap in cmaps_by_font_obj.items():
        pat = re.compile(rb"/([A-Za-z0-9.+_-]+)\s+" + str(objnum).encode() + rb"\s+\d+\s+R")
        for space in spaces:
            for m in pat.finditer(space):
                name = m.group(1).decode("latin-1")
                if name not in ("ToUnicode", "Length", "Parent", "Contents"):
                    out[name] = cmap
    return out
