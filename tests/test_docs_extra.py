"""pptx / ODF / RTF / eml / EPUB extractors + end-to-end MIME routing."""

from __future__ import annotations

import io
import zipfile

import pytest

from morphik_core_spark.functions.docs_extra import (
    extract_eml_text,
    extract_epub_text,
    extract_odf_text,
    extract_pptx_text,
    extract_rtf_text,
)

_A = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _zipb(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, c in files.items():
            z.writestr(n, c)
    return buf.getvalue()


def _pptx(slides: list[list[str]]) -> bytes:
    files = {}
    for i, paras in enumerate(slides, 1):
        body = "".join(
            f'<a:p><a:r><a:t>{p}</a:t></a:r></a:p>' for p in paras
        )
        files[f"ppt/slides/slide{i}.xml"] = (
            f'<p:sld xmlns:a="{_A}" xmlns:p="x">{body}</p:sld>'
        )
    return _zipb(files)


def test_pptx_slide_order_and_runs():
    data = _pptx([["First slide", "with bullet"], ["Second"]])
    text = extract_pptx_text(data)
    assert text == "First slide\nwith bullet\n\nSecond"
    # slide10 must sort after slide2 (numeric, not lexicographic)
    many = _pptx([[f"s{i}"] for i in range(1, 11)])
    assert extract_pptx_text(many).split("\n\n")[-1] == "s10"


def test_odf_paragraphs_and_headings():
    odt = _zipb({
        "content.xml": (
            '<o:d xmlns:o="o" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
            "<text:h>Head</text:h><text:p>Body <text:span>nested</text:span></text:p></o:d>"
        )
    })
    assert extract_odf_text(odt) == "Head\nBody nested"


def test_rtf_controls_unicode_and_destinations():
    rtf = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\*\generator Gen}"
        rb"Caf\'e9 \u8211?dash\tab tabbed\par next\par}"
    )
    text = extract_rtf_text(rtf)
    assert "Café" in text and "–dash" in text and "\ttabbed" in text
    assert "Arial" not in text and "Gen" not in text  # destinations skipped
    assert text.endswith("next")
    with pytest.raises(ValueError):
        extract_rtf_text(b"not rtf at all")


def test_eml_headers_and_multipart_fallback():
    plain = (
        b"Subject: Hi there\r\nFrom: a@x.com\r\nTo: b@y.com\r\n"
        b"Content-Type: text/plain\r\n\r\nplain body\r\n"
    )
    t = extract_eml_text(plain)
    assert t.startswith("Subject: Hi there") and "plain body" in t
    html_only = (
        b"Subject: H\r\nMIME-Version: 1.0\r\n"
        b'Content-Type: multipart/alternative; boundary="B"\r\n\r\n'
        b"--B\r\nContent-Type: text/html\r\n\r\n<p>html <b>body</b></p>\r\n--B--\r\n"
    )
    assert "html body" in extract_eml_text(html_only)


def test_epub_chapters():
    epub = _zipb({
        "mimetype": "application/epub+zip",
        "OEBPS/a.xhtml": "<html><body><p>One</p></body></html>",
        "OEBPS/b.xhtml": "<html><body><p>Two</p></body></html>",
    })
    assert extract_epub_text(epub) == "One\n\nTwo"


def test_routing_end_to_end(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    (tmp_path / "deck.pptx").write_bytes(_pptx([["Deck text"]]))
    (tmp_path / "note.rtf").write_bytes(rb"{\rtf1 rtf text\par}")
    (tmp_path / "mail.eml").write_bytes(b"Subject: S\r\n\r\nmail body\r\n")
    (tmp_path / "book.epub").write_bytes(
        _zipb({"c.xhtml": "<html><body><p>book text</p></body></html>"})
    )
    (tmp_path / "doc.odt").write_bytes(
        _zipb({"content.xml": '<d xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><text:p>odt text</text:p></d>'})
    )
    out = {r["filename"]: r for r in files_to_raw_docs(read_binary_dir(spark, str(tmp_path))).collect()}
    assert out["deck.pptx"]["parse_status"] == "ok" and "Deck text" in out["deck.pptx"]["text"]
    assert "rtf text" in out["note.rtf"]["text"]
    assert "mail body" in out["mail.eml"]["text"]
    assert "book text" in out["book.epub"]["text"]
    assert "odt text" in out["doc.odt"]["text"]
