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


# ----------------------------------------------- stream filters / images


def _obj_stream(dict_body: bytes, payload: bytes) -> bytes:
    return b"<<" + dict_body + b">>\nstream\n" + payload + b"\nendstream\n"


def _pdf(body: bytes) -> bytes:
    return b"%PDF-1.4\n" + body + b"%%EOF"


def _content(text: str) -> bytes:
    return b"BT (" + text.encode() + b") Tj ET"


def test_lzw_ascii85_hex_runlength_filters():
    import base64
    import binascii
    import zlib as _z

    from morphik_core_spark.functions.pdf import extract_pdf_text
    from morphik_core_spark.functions.tiff import _lzw_encode_tiff

    c1 = _content("lzw stream text")
    c2 = _content("a85 stream text")
    c3 = _content("hex stream text")
    c4 = _content("runlength text")
    body = (
        _obj_stream(b"/Length 0 /Filter /LZWDecode", _lzw_encode_tiff(c1))
        + _obj_stream(b"/Filter /ASCII85Decode", base64.a85encode(c2) + b"~>")
        + _obj_stream(b"/Filter /ASCIIHexDecode", binascii.hexlify(c3) + b">")
        + _obj_stream(
            b"/Filter [/ASCII85Decode /FlateDecode]",
            base64.a85encode(_z.compress(c4)) + b"~>",
        )
    )
    text = extract_pdf_text(_pdf(body))
    for want in ("lzw stream text", "a85 stream text", "hex stream text", "runlength text"):
        assert want in text


def test_runlength_filter_decodes():
    from morphik_core_spark.functions.pdf import apply_stream_filters

    # 3x 'a' as a run + literal 'bc' + EOD
    data = bytes([254]) + b"a" + bytes([1]) + b"bc" + bytes([128])
    assert apply_stream_filters(data, ["RunLengthDecode"]) == b"aaabc"


def test_extract_embedded_dct_image():
    import numpy as np

    from morphik_core_spark.functions.jpeg import decode_jpeg, encode_jpeg_baseline
    from morphik_core_spark.functions.pdf import extract_pdf_images

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    jpg = encode_jpeg_baseline(img)
    body = _obj_stream(
        b"/Subtype /Image /Width 32 /Height 24 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceRGB /Filter /DCTDecode", jpg
    ) + _obj_stream(b"/Length 20", _content("some page text"))
    images = extract_pdf_images(_pdf(body))
    assert len(images) == 1
    assert np.array_equal(images[0], decode_jpeg(jpg))


def test_extract_flate_rgb_and_gray_images():
    import zlib as _z

    import numpy as np

    from morphik_core_spark.functions.pdf import extract_pdf_images

    rgb = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    body = _obj_stream(
        b"/Subtype /Image /Width 6 /Height 4 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceRGB /Filter /FlateDecode", _z.compress(rgb.tobytes())
    ) + _obj_stream(
        b"/Subtype /Image /Width 4 /Height 3 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray", gray.tobytes()
    )
    images = extract_pdf_images(_pdf(body))
    assert len(images) == 2
    assert np.array_equal(images[0], rgb)
    assert np.array_equal(images[1], np.repeat(gray[:, :, None], 3, axis=2))


def test_bad_image_is_skipped_not_fatal():
    from morphik_core_spark.functions.pdf import extract_pdf_images

    body = _obj_stream(
        b"/Subtype /Image /Width 8 /Height 8 /Filter /DCTDecode", b"not a jpeg"
    )
    assert extract_pdf_images(_pdf(body)) == []


def test_cid_font_with_tounicode_cmap():
    import zlib as _z

    from morphik_core_spark.functions.pdf import extract_pdf_text

    # CMap: CIDs 1..3 -> "Héllo" pieces via bfchar + bfrange
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar\n<0001> <0048>\n<0002> <00E9>\n endbfchar\n"
        b"1 beginbfrange\n<0003> <0005> <006C>\nendbfrange\n"  # l m n
        b"1 beginbfrange\n<0010> <0010> [<0057006F0072006C0064>]\nendbfrange\n"
        b"endcmap end end"
    )
    cmap_z = _z.compress(cmap)
    # text: CIDs 1 2 3 (H é l), then 0x0010 -> "World"
    content = b"BT /F7 12 Tf <000100020003> Tj ( ) Tj <0010> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"4 0 obj <</Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H "
        b"/ToUnicode 5 0 R>> endobj\n"
        b"5 0 obj <</Length " + str(len(cmap_z)).encode() + b" /Filter /FlateDecode>>\n"
        b"stream\n" + cmap_z + b"\nendstream endobj\n"
        b"6 0 obj <</Font <</F7 4 0 R>>>> endobj\n"
        b"7 0 obj <</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream endobj\n%%EOF"
    )
    text = extract_pdf_text(pdf)
    assert "Hél" in text
    assert "World" in text
    # the CID bytes must NOT leak through as latin-1 garbage
    assert "\x00" not in text


def test_non_cid_text_unaffected_by_cid_machinery():
    from morphik_core_spark.functions.pdf import extract_pdf_text

    pdf = (
        b"%PDF-1.4\n<</Length 30>>\nstream\n"
        b"BT /F1 10 Tf (plain latin text) Tj ET\nendstream\n%%EOF"
    )
    assert "plain latin text" in extract_pdf_text(pdf)


# ------------------------------------------------- page rasterization


def make_pdf_pages(pages_ops: list[bytes], media_box: bytes = b"[0 0 612 792]") -> bytes:
    """A multi-page PDF: one content stream per page, shared font."""
    out = [b"%PDF-1.4\n", b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"]
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(len(pages_ops)))
    out.append(
        b"2 0 obj << /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages_ops)).encode() + b" /MediaBox " + media_box + b" >> endobj\n"
    )
    for i, ops in enumerate(pages_ops):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        out.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /Contents %d 0 R "
            b"/Resources << /Font << /F1 99 0 R >> >> >> endobj\n" % (pnum, cnum)
        )
        out.append(
            b"%d 0 obj << /Length %d >> stream\n" % (cnum, len(ops)) + ops + b"\nendstream endobj\n"
        )
    out.append(b"99 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def test_rasterize_one_bitmap_per_page_for_text_only_pdf():
    """VERDICT item 5's done-bar: a text-only PDF yields one page image
    per page, in page-tree order, with ink where the text ops put it."""
    import numpy as np

    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    pdf = make_pdf_pages([
        b"BT /F1 12 Tf 72 720 Td (Top of page one) Tj ET",
        b"BT /F1 12 Tf 72 100 Td (Bottom of page two) Tj ET",
        b"",  # an empty (vector-only) page still renders a bitmap
    ])
    pages = rasterize_pdf_pages(pdf, dpi=72)
    assert len(pages) == 3
    assert all(p.shape == (792, 612) for p in pages)
    # page 1 inks near the top (y=720pt -> row ~72), page 2 near the bottom
    r1 = np.where((pages[0] < 255).any(axis=1))[0]
    r2 = np.where((pages[1] < 255).any(axis=1))[0]
    assert 55 <= r1.min() and r1.max() <= 80
    assert 675 <= r2.min() and r2.max() <= 700
    assert (pages[2] == 255).all()  # blank page, full-size bitmap


def test_rasterize_respects_tm_and_dpi():
    import numpy as np

    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    # Tm places text at (200, 400); DPI 144 doubles the bitmap
    pdf = make_pdf_pages([b"BT /F1 10 Tf 1 0 0 1 200 400 Tm (X) Tj ET"])
    (page,) = rasterize_pdf_pages(pdf, dpi=144)
    assert page.shape == (1584, 1224)
    rows = np.where((page < 255).any(axis=1))[0]
    cols = np.where((page < 255).any(axis=0))[0]
    assert abs(cols.min() - 200 * 2) <= 2
    assert abs(rows.max() - (792 - 400) * 2) <= 6  # baseline+descent below y=400pt


def test_rasterize_compressed_content_and_crypt_path():
    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    pdf = make_pdf(BASIC_OPS, compress=True)
    pages = rasterize_pdf_pages(pdf, dpi=72)
    assert len(pages) == 1 and (pages[0] < 255).any()


def test_rasterize_rejects_non_pdf():
    import pytest as _pytest

    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    with _pytest.raises(ValueError, match="PDF"):
        rasterize_pdf_pages(b"plain text")


def test_layout_extraction_reading_order_two_columns():
    """XY-cut reading order: a two-column page whose content stream
    interleaves the columns line-by-line (show order != reading order)
    must come out left-column-complete, then right column."""
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    ops = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 700 Tm (Left one) Tj "
        b"1 0 0 1 350 700 Tm (Right one) Tj "
        b"1 0 0 1 72 684 Tm (Left two) Tj "
        b"1 0 0 1 350 684 Tm (Right two) Tj "
        b"ET"
    )
    text = extract_pdf_text_layout(make_pdf_pages([ops]))
    assert text.splitlines() == ["Left one", "Left two", "Right one", "Right two"]


def test_layout_extraction_scrambled_stream_order():
    """Runs emitted bottom-up in the stream still read top-down."""
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    ops = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 100 Tm (last line) Tj "
        b"1 0 0 1 72 700 Tm (first line) Tj "
        b"1 0 0 1 72 400 Tm (middle line) Tj "
        b"ET"
    )
    text = extract_pdf_text_layout(make_pdf_pages([ops]))
    assert text.splitlines() == ["first line", "middle line", "last line"]


def test_layout_extraction_joins_runs_on_one_line():
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    # two Tj runs on the same baseline, second placed just past the first
    ops = (
        b"BT /F1 12 Tf 72 700 Td (Hello) Tj ET "
        b"BT /F1 12 Tf 110 700 Td (World) Tj ET"
    )
    text = extract_pdf_text_layout(make_pdf_pages([ops]))
    assert text == "Hello World"


def test_layout_extraction_multipage_formfeed():
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    pdf = make_pdf_pages([
        b"BT /F1 12 Tf 72 700 Td (page one) Tj ET",
        b"BT /F1 12 Tf 72 700 Td (page two) Tj ET",
    ])
    assert extract_pdf_text_layout(pdf) == "page one\fpage two"


def test_layout_extraction_matches_linear_for_simple_pdf():
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout

    text = extract_pdf_text_layout(make_pdf(BASIC_OPS))
    assert text.splitlines() == ["Hello World", "Second line"]


def make_pdf_objstm(pages_ops: list[bytes]) -> bytes:
    """A PDF 1.5-style file: catalog/pages/page dicts packed into a
    Flate-compressed /ObjStm; content streams stay direct objects."""
    packed = []
    packed.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(len(pages_ops)))
    packed.append((2, b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                   + str(len(pages_ops)).encode() + b" /MediaBox [0 0 612 792] >>"))
    for i in range(len(pages_ops)):
        packed.append((10 + i, b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % (50 + i)))
    bodies = [b for _, b in packed]
    offsets, pos = [], 0
    for b in bodies:
        offsets.append(pos)
        pos += len(b) + 1
    header = b" ".join(b"%d %d" % (num, off) for (num, _), off in zip(packed, offsets)) + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    stm = zlib.compress(payload)
    out = [b"%PDF-1.5\n"]
    out.append(
        b"90 0 obj << /Type /ObjStm /N " + str(len(packed)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length " + str(len(stm)).encode()
        + b" >> stream\n" + stm + b"\nendstream endobj\n"
    )
    for i, ops in enumerate(pages_ops):
        out.append(
            b"%d 0 obj << /Length %d >> stream\n" % (50 + i, len(ops)) + ops + b"\nendstream endobj\n"
        )
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def test_objstm_page_tree_rasterize_and_layout():
    """PDF 1.5 object streams: page/catalog dicts live compressed inside
    an /ObjStm — the page tree, rasterizer, and layout extractor must
    all see them."""
    import numpy as np

    from morphik_core_spark.functions.pdf_render import (
        extract_pdf_text_layout, parse_page_tree, rasterize_pdf_pages,
    )

    pdf = make_pdf_objstm([
        b"BT /F1 12 Tf 72 700 Td (packed page one) Tj ET",
        b"BT /F1 12 Tf 72 700 Td (packed page two) Tj ET",
    ])
    pages = parse_page_tree(pdf)
    assert len(pages) == 2
    assert pages[0][0] == (0.0, 0.0, 612.0, 792.0)  # MediaBox inherited via Parent in ObjStm
    bitmaps = rasterize_pdf_pages(pdf, dpi=72)
    assert len(bitmaps) == 2 and all((p < 255).any() for p in bitmaps)
    assert extract_pdf_text_layout(pdf) == "packed page one\fpacked page two"


def test_objstm_corrupt_header_keeps_document_usable():
    from morphik_core_spark.functions.pdf_render import parse_page_tree

    pdf = bytearray(make_pdf_objstm([b"BT (x) Tj ET"]))
    i = pdf.index(b"/N 3")
    pdf[i : i + 4] = b"/N 0"  # header count zeroed: stream skipped, no crash
    pages = parse_page_tree(bytes(pdf))
    # packed page dicts lost -> pseudo-page fallback over BT streams
    assert len(pages) == 1 and b"BT" in pages[0][1]


def test_cid_font_packed_in_objstm_still_decodes():
    """PDF 1.5 layout: the Type0 font dict AND the resource dict binding
    /F7 to it live inside an /ObjStm; the CMap stream stays direct. CID
    text must still decode through the packed font graph."""
    from morphik_core_spark.functions.pdf import extract_pdf_text

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange\n<0010> <0010> [<0057006F0072006C0064>]\nendbfrange\n"
        b"endcmap end end"
    )
    cmap_z = zlib.compress(cmap)
    content = b"BT /F7 12 Tf <0010> Tj ET"

    packed = [
        (4, b"<</Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H /ToUnicode 5 0 R>>"),
        (6, b"<</Font <</F7 4 0 R>>>>"),
    ]
    bodies = [b for _, b in packed]
    offsets, pos = [], 0
    for b in bodies:
        offsets.append(pos)
        pos += len(b) + 1
    header = b" ".join(b"%d %d" % (num, off) for (num, _), off in zip(packed, offsets)) + b"\n"
    stm = zlib.compress(header + b"\n".join(bodies) + b"\n")
    pdf = (
        b"%PDF-1.5\n"
        b"90 0 obj << /Type /ObjStm /N 2 /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length " + str(len(stm)).encode() + b" >> stream\n"
        + stm + b"\nendstream endobj\n"
        b"5 0 obj <</Length " + str(len(cmap_z)).encode() + b" /Filter /FlateDecode>>\n"
        b"stream\n" + cmap_z + b"\nendstream endobj\n"
        b"7 0 obj <</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream endobj\n%%EOF"
    )
    text = extract_pdf_text(pdf)
    assert "World" in text
    assert "\x00" not in text
