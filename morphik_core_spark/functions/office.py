"""OOXML (xlsx/docx) text extraction with the stdlib only.

Both formats are zip archives of XML, so no parser library is needed for
the fast paths the reference cares about:

- :func:`extract_xlsx_markdown` mirrors the reference's Excel fast path
  (morphik_parser.py:381-429, openpyxl → markdown tables) byte-for-byte
  in output shape: one ``## {sheet}`` heading per sheet, markdown table
  rows with a ``---`` separator after the first row, fully-empty rows
  skipped, trailing empty columns trimmed, ``|`` escaped.
- :func:`extract_docx_text` pulls paragraph text from word/document.xml
  (the reference routes docx through Docling; plain paragraph text is
  the honest minimal equivalent).

Not handled (documented limits): cell date formatting (numeric serials
print as numbers), formulas (cached values are used when present, like
openpyxl data_only=True), embedded objects, encrypted workbooks.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

__all__ = ["extract_xlsx_markdown", "extract_docx_text", "looks_like_zip"]

_SHEET_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKGREL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_WORD_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def looks_like_zip(data: bytes | None) -> bool:
    return bool(data) and data[:2] == b"PK"


def _col_index(ref: str) -> int:
    """A → 0, B → 1, ..., AA → 26 (A1-notation column)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(cell, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_SHEET_NS}is")
        if is_el is None:
            return None
        return "".join(el.text or "" for el in is_el.iter(f"{_SHEET_NS}t")) or None
    v = cell.find(f"{_SHEET_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return None
    if t == "b":
        return "True" if raw == "1" else "False"
    if t in ("str", "e"):
        return raw
    # numeric: mirror openpyxl's int/float → str() rendering
    try:
        f = float(raw)
        return str(int(f)) if f == int(f) and "e" not in raw.lower() else str(f)
    except ValueError:
        return raw


def extract_xlsx_markdown(data: bytes, shared_strings_cap: int = 1_000_000) -> str:
    """xlsx bytes → markdown tables in the reference's fast-path shape."""
    if not looks_like_zip(data):
        raise ValueError("not an OOXML file (missing PK zip header)")
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("not a spreadsheet (no xl/workbook.xml)")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.iter(f"{_SHEET_NS}si"):
            shared.append("".join(el.text or "" for el in si.iter(f"{_SHEET_NS}t")))
            if len(shared) > shared_strings_cap:
                raise ValueError("sharedStrings table exceeds cap")

    # sheet order + names from workbook.xml; physical files from the rels
    rels = {}
    rel_path = "xl/_rels/workbook.xml.rels"
    if rel_path in names:
        for rel in ElementTree.fromstring(zf.read(rel_path)).iter(f"{_PKGREL_NS}Relationship"):
            target = rel.get("Target", "")
            rels[rel.get("Id")] = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"

    parts: list[str] = []
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    for sheet in wb.iter(f"{_SHEET_NS}sheet"):
        sheet_name = sheet.get("name", "Sheet")
        target = rels.get(sheet.get(f"{_REL_NS}id"))
        if target is None or target not in names:
            continue
        sroot = ElementTree.fromstring(zf.read(target))

        rows: list[dict[int, str | None]] = []
        for row in sroot.iter(f"{_SHEET_NS}row"):
            cells: dict[int, str | None] = {}
            next_idx = 0
            for cell in row.iter(f"{_SHEET_NS}c"):
                ref = cell.get("r")
                m = _CELL_REF_RE.match(ref) if ref else None
                idx = _col_index(m.group(1)) if m else next_idx
                next_idx = idx + 1
                cells[idx] = _cell_value(cell, shared)
            if any(v is not None for v in cells.values()):
                rows.append(cells)

        if not rows:
            continue
        parts.append(f"## {sheet_name}\n")
        max_cols = max((max(i for i, v in r.items() if v is not None) + 1) for r in rows)
        for row_idx, r in enumerate(rows):
            cells_out = []
            for col_idx in range(max_cols):
                val = r.get(col_idx)
                cells_out.append((val if val is not None else "").replace("|", "\\|"))
            parts.append("| " + " | ".join(cells_out) + " |")
            if row_idx == 0:
                parts.append("| " + " | ".join(["---"] * max_cols) + " |")
        parts.append("")

    text = "\n".join(parts)
    if not text.strip():
        raise ValueError("no extractable sheet content")
    return text


def extract_docx_text(data: bytes) -> str:
    """docx bytes → paragraph text (one line per w:p)."""
    if not looks_like_zip(data):
        raise ValueError("not an OOXML file (missing PK zip header)")
    zf = zipfile.ZipFile(io.BytesIO(data))
    if "word/document.xml" not in zf.namelist():
        raise ValueError("not a word document (no word/document.xml)")
    root = ElementTree.fromstring(zf.read("word/document.xml"))
    paras: list[str] = []
    for p in root.iter(f"{_WORD_NS}p"):
        runs = []
        for el in p.iter():
            if el.tag == f"{_WORD_NS}t" and el.text:
                runs.append(el.text)
            elif el.tag in (f"{_WORD_NS}tab",):
                runs.append("\t")
            elif el.tag in (f"{_WORD_NS}br", f"{_WORD_NS}cr"):
                runs.append("\n")
        paras.append("".join(runs))
    text = "\n".join(paras).strip()
    if not text:
        raise ValueError("no extractable paragraph text")
    return text
