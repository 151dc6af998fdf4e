"""OOXML extraction: xlsx→markdown (reference fast-path shape) and docx."""

from __future__ import annotations

import io
import zipfile

import pytest

from morphik_core_spark.functions.office import extract_docx_text, extract_xlsx_markdown

_SHEET_XMLNS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_REL_XMLNS = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def make_xlsx(sheet_xml: str, shared: list[str] | None = None, sheet_name: str = "Data") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook {_SHEET_XMLNS} {_REL_XMLNS}>'
            f'<sheets><sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        if shared is not None:
            items = "".join(f"<si><t>{s}</t></si>" for s in shared)
            zf.writestr("xl/sharedStrings.xml", f"<sst {_SHEET_XMLNS}>{items}</sst>")
        zf.writestr("xl/worksheets/sheet1.xml", f"<worksheet {_SHEET_XMLNS}>{sheet_xml}</worksheet>")
    return buf.getvalue()


def make_docx(paragraphs: list[str]) -> bytes:
    buf = io.BytesIO()
    body = "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs)
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            f"<w:body>{body}</w:body></w:document>",
        )
    return buf.getvalue()


def test_xlsx_markdown_reference_shape():
    sheet = (
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>5</v></c><c r="B2"><v>2.5</v></c></row>'
        '<row r="3"/>'  # fully empty row is skipped
        '<row r="4"><c r="A4" t="s"><v>2</v></c></row>'
        "</sheetData>"
    )
    md = extract_xlsx_markdown(make_xlsx(sheet, shared=["name", "score", "pipe|cell"]))
    assert md == (
        "## Data\n"
        "\n"
        "| name | score |\n"
        "| --- | --- |\n"
        "| 5 | 2.5 |\n"
        "| pipe\\|cell |  |\n"
    )


def test_xlsx_skips_gap_columns_and_bools():
    sheet = (
        "<sheetData>"
        '<row r="1"><c r="A1"><v>1</v></c><c r="C1" t="b"><v>1</v></c></row>'
        "</sheetData>"
    )
    md = extract_xlsx_markdown(make_xlsx(sheet))
    assert "| 1 |  | True |" in md


def test_xlsx_inline_string():
    sheet = '<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>hi</t></is></c></row></sheetData>'
    assert "| hi |" in extract_xlsx_markdown(make_xlsx(sheet))


def test_xlsx_not_spreadsheet_raises():
    with pytest.raises(ValueError):
        extract_xlsx_markdown(b"not a zip at all")
    with pytest.raises(ValueError):
        extract_xlsx_markdown(make_docx(["hello"]))  # zip, but no workbook


def test_docx_paragraphs_tabs_breaks():
    docx = make_docx(["first para", "second para"])
    assert extract_docx_text(docx) == "first para\nsecond para"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            "<w:body><w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
            "</w:body></w:document>",
        )
    assert extract_docx_text(buf.getvalue()) == "a\tb\nc"


def test_office_routing_end_to_end(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    d = tmp_path / "drop"
    d.mkdir()
    sheet = '<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData>'
    (d / "book.xlsx").write_bytes(make_xlsx(sheet, shared=["cell"]))
    (d / "memo.docx").write_bytes(make_docx(["memo text body"]))
    (d / "broken.xlsx").write_bytes(b"PK\x03\x04 but junk inside")

    raw = files_to_raw_docs(read_binary_dir(spark, str(d)))
    rows = {r.filename: r for r in raw.collect()}
    assert rows["book.xlsx"].parse_status == "ok" and "| cell |" in rows["book.xlsx"].text
    assert rows["memo.docx"].parse_status == "ok" and rows["memo.docx"].text == "memo text body"
    assert rows["broken.xlsx"].parse_status == "parse_failed" and rows["broken.xlsx"].text is None
