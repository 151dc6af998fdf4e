"""Additional document-format extractors: pptx, OpenDocument (odt/ods),
RTF, email (eml), and EPUB — all stdlib (zipfile/ElementTree/email/re),
same contract as the office/pdf extractors: return text or raise
ValueError so `sources/binary` isolates the row.

These close the long tail of real document corpora (slide decks, ODF
exports, legacy RTF, mail archives like Enron, ebook collections); the
reference shells these through unstructured/LibreOffice
(`core/parser/morphik_parser.py:527-616`) — here each common format gets
a direct parser instead of an external process."""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

from morphik_core_spark.functions.html import extract_html_text

__all__ = [
    "extract_pptx_text",
    "extract_odf_text",
    "extract_rtf_text",
    "extract_eml_text",
    "extract_epub_text",
]

_DRAW_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_ODF_TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def extract_pptx_text(data: bytes) -> str:
    """pptx bytes → slide text (slides in order, one blank line between)."""
    if data[:2] != b"PK":
        raise ValueError("not an OOXML file (missing PK zip header)")
    zf = zipfile.ZipFile(io.BytesIO(data))
    slide_re = re.compile(r"ppt/slides/slide(\d+)\.xml$")
    slides = sorted(
        (int(m.group(1)), n) for n in zf.namelist() if (m := slide_re.match(n))
    )
    if not slides:
        raise ValueError("not a presentation (no ppt/slides/*.xml)")
    out = []
    for _, name in slides:
        root = ElementTree.fromstring(zf.read(name))
        paras = []
        for p in root.iter(f"{_DRAW_NS}p"):
            runs = [el.text for el in p.iter(f"{_DRAW_NS}t") if el.text]
            if runs:
                paras.append("".join(runs))
        out.append("\n".join(paras))
    text = "\n\n".join(s for s in out if s).strip()
    if not text:
        raise ValueError("no extractable slide text")
    return text


def extract_odf_text(data: bytes) -> str:
    """odt/ods bytes → text (paragraphs and headings from content.xml)."""
    if data[:2] != b"PK":
        raise ValueError("not an OpenDocument file (missing PK zip header)")
    zf = zipfile.ZipFile(io.BytesIO(data))
    if "content.xml" not in zf.namelist():
        raise ValueError("not an OpenDocument file (no content.xml)")
    root = ElementTree.fromstring(zf.read("content.xml"))
    paras = []
    for el in root.iter():
        if el.tag in (f"{_ODF_TEXT_NS}p", f"{_ODF_TEXT_NS}h"):
            txt = "".join(el.itertext())
            if txt.strip():
                paras.append(txt)
    text = "\n".join(paras).strip()
    if not text:
        raise ValueError("no extractable ODF text")
    return text


_RTF_DEST_SKIP = (
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header", "footer",
    "*",
)


def extract_rtf_text(data: bytes) -> str:
    """RTF bytes → text: control-word walker with destination skipping,
    \\uN unicode escapes, hex escapes, and \\par/\\line breaks."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF file")
    s = data.decode("latin-1", errors="replace")
    out: list[str] = []
    i, n = 0, len(s)
    skip_depth = 0  # depth inside a skipped destination group
    depth = 0
    uc_skip = 1  # \ucN: bytes to skip after \uN
    pending_skip = 0
    while i < n:
        c = s[i]
        if pending_skip > 0 and c not in "{}\\":
            pending_skip -= 1
            i += 1
            continue
        if c == "{":
            depth += 1
            i += 1
            # destination group? peek \*\dest or \dest
            m = re.match(r"\\\*?\\?([a-z]+)", s[i : i + 20])
            if skip_depth == 0 and m and (m.group(1) in _RTF_DEST_SKIP or s[i : i + 2] == "\\*"):
                skip_depth = depth
        elif c == "}":
            if skip_depth and depth == skip_depth:
                skip_depth = 0
            depth -= 1
            i += 1
        elif c == "\\":
            m = re.match(r"\\([a-z]+)(-?\d+)? ?", s[i:])
            if m:
                word, num = m.group(1), m.group(2)
                i += m.end()
                if skip_depth:
                    continue
                if word == "par" or word == "line":
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word == "uc" and num is not None:
                    uc_skip = int(num)
                elif word == "u" and num is not None:
                    cp = int(num)
                    out.append(chr(cp + 65536 if cp < 0 else cp))
                    pending_skip = uc_skip
            elif i + 1 < n and s[i + 1] == "'":
                if not skip_depth:
                    try:
                        out.append(bytes([int(s[i + 2 : i + 4], 16)]).decode("latin-1"))
                    except ValueError:
                        pass
                i += 4
            elif i + 1 < n and s[i + 1] in "{}\\":
                if not skip_depth:
                    out.append(s[i + 1])
                i += 2
            else:
                i += 2
        else:
            if not skip_depth and c not in "\r\n":
                out.append(c)
            i += 1
    text = "".join(out).strip()
    if not text:
        raise ValueError("no extractable RTF text")
    return text


def extract_eml_text(data: bytes) -> str:
    """RFC-822 email bytes → 'Subject/From/To' header block + body text;
    multipart walks prefer text/plain, fall back to text/html through the
    shared extractor."""
    import email
    from email import policy

    try:
        msg = email.message_from_bytes(data, policy=policy.default)
    except Exception as exc:  # noqa: BLE001
        raise ValueError(f"unparseable email: {exc}") from exc
    if not msg.keys():
        raise ValueError("not an email (no RFC-822 headers)")
    heads = [f"{k}: {msg[k]}" for k in ("Subject", "From", "To", "Date") if msg[k]]
    plain, html = [], []
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype == "text/plain":
            plain.append(part.get_content())
        elif ctype == "text/html":
            html.append(part.get_content())
    body = "\n".join(plain).strip() or "\n".join(extract_html_text(h) for h in html).strip()
    text = ("\n".join(heads) + "\n\n" + body).strip()
    if not body and not heads:
        raise ValueError("no extractable email content")
    return text


def extract_epub_text(data: bytes) -> str:
    """EPUB bytes → chapter text: every (x)html item in spine-ish order
    (alphabetical fallback — fixture-grade ordering) through the HTML
    extractor."""
    if data[:2] != b"PK":
        raise ValueError("not an EPUB (missing PK zip header)")
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = sorted(
        n for n in zf.namelist() if n.lower().endswith((".xhtml", ".html", ".htm"))
    )
    if not names:
        raise ValueError("EPUB contains no html chapters")
    chapters = []
    for n in names:
        try:
            chapters.append(extract_html_text(zf.read(n).decode("utf-8", errors="replace")))
        except ValueError:
            continue
    text = "\n\n".join(c for c in chapters if c.strip()).strip()
    if not text:
        raise ValueError("no extractable EPUB text")
    return text
