"""Ruled-table extraction from synthesized PDFs (functions/pdf_tables).

Fixtures draw real rule grids with `re`/`m l S` graphics ops around
positioned text, exercising the full path: graphics interpretation →
grid clustering → component split → cell assignment. Closes the ruled
half of the reference's Docling table gap
(core/parser/morphik_parser.py:295-346)."""

from __future__ import annotations

import pytest

from morphik_core_spark.functions.pdf_tables import (
    detect_tables,
    extract_pdf_tables,
    page_line_segments,
    table_to_markdown,
)
from tests.test_pdf import make_pdf, make_pdf_pages


def _grid_ops(x0=100, y0=600, cols=(0, 80, 160, 240), rows=(0, 20, 40, 60)) -> bytes:
    """Stroke a grid: h-lines at y0+r, v-lines at x0+c."""
    ops = []
    for r in rows:
        ops.append(f"{x0} {y0 + r} m {x0 + cols[-1]} {y0 + r} l S".encode())
    for c in cols:
        ops.append(f"{x0 + c} {y0} m {x0 + c} {y0 + rows[-1]} l S".encode())
    return b" ".join(ops)


def _cell_text(x, y, s) -> bytes:
    return f"BT /F1 10 Tf {x} {y} Td ({s}) Tj ET".encode()


def test_page_line_segments_transforms_and_paints():
    # one stroked line, one filled thin rect (a drawn rule), one clip-only
    # rect that must NOT count, all under a translation cm
    ops = (
        b"q 1 0 0 1 50 40 re W n Q "  # clip path: dropped
        b"q 1 0 0 1 10 5 cm "
        b"100 600 m 300 600 l S "  # h-line at y=605 (after cm)
        b"100 500 200 1 re f "  # filled 1pt rule -> h-line at ~505.5
        b"Q"
    )
    h, v = page_line_segments(ops)
    ys = sorted(round(seg[0]) for seg in h)
    assert 605 in ys
    assert any(500 <= y <= 510 for y in ys)
    # the clip rect contributed nothing
    assert all(not (38 <= y <= 42) for y in ys)
    # the filled rect's two 1pt verticals are below _MIN_RULE_LEN: dropped
    assert v == []


def test_extract_simple_grid_with_cells():
    ops = _grid_ops() + b" " + b" ".join(
        [
            _cell_text(110, 645, "name"), _cell_text(190, 645, "lang"), _cell_text(270, 645, "n"),
            _cell_text(110, 625, "alpha"), _cell_text(190, 625, "en"), _cell_text(270, 625, "3"),
            _cell_text(110, 605, "beta"), _cell_text(190, 605, "de"), _cell_text(270, 605, "7"),
        ]
    )
    tables = extract_pdf_tables(make_pdf(ops))
    assert len(tables) == 1
    t = tables[0]
    assert t["page"] == 1 and (t["n_rows"], t["n_cols"]) == (3, 3)
    assert t["cells"] == [
        ["name", "lang", "n"],
        ["alpha", "en", "3"],
        ["beta", "de", "7"],
    ]
    md = table_to_markdown(t)
    assert md.splitlines()[0] == "| name | lang | n |"
    assert "| beta | de | 7 |" in md


def test_two_tables_on_one_page_split_into_components():
    top = _grid_ops(y0=700, rows=(0, 20, 40)) + b" " + b" ".join(
        [_cell_text(110, 725, "t1a"), _cell_text(190, 725, "t1b"), _cell_text(270, 725, "t1c"),
         _cell_text(110, 705, "t1d"), _cell_text(190, 705, "t1e"), _cell_text(270, 705, "t1f")]
    )
    bottom = _grid_ops(y0=300, rows=(0, 20, 40)) + b" " + b" ".join(
        [_cell_text(110, 325, "t2a"), _cell_text(190, 325, "t2b"), _cell_text(270, 325, "t2c"),
         _cell_text(110, 305, "t2d"), _cell_text(190, 305, "t2e"), _cell_text(270, 305, "t2f")]
    )
    tables = extract_pdf_tables(make_pdf(top + b" " + bottom))
    assert len(tables) == 2
    assert tables[0]["cells"][0][0] == "t1a"  # top-of-page table first
    assert tables[1]["cells"][0][0] == "t2a"


def test_lone_box_and_underline_are_not_tables():
    ops = (
        b"100 600 200 50 re S "  # a single box: 2x2 rules but no inner grid
        b"100 500 m 300 500 l S"  # an underline
        + b" " + _cell_text(120, 620, "not a table")
    )
    assert extract_pdf_tables(make_pdf(ops)) == []


def test_text_outside_grid_is_excluded_and_empty_cells_stay_empty():
    ops = _grid_ops() + b" " + b" ".join(
        [_cell_text(110, 645, "only"), _cell_text(50, 700, "outside"), _cell_text(400, 620, "also outside")]
    )
    tables = extract_pdf_tables(make_pdf(ops))
    assert len(tables) == 1
    cells = tables[0]["cells"]
    assert cells[0][0] == "only"
    flat = [c for row in cells for c in row]
    assert flat.count("") == 8
    assert "outside" not in " ".join(flat)


def test_multi_page_numbers_and_isolation():
    grid_page = _grid_ops() + b" " + _cell_text(110, 645, "p2cell")
    tables = extract_pdf_tables(
        make_pdf_pages([b"BT /F1 12 Tf 72 700 Td (plain page) Tj ET", grid_page])
    )
    assert [t["page"] for t in tables] == [2]
    assert tables[0]["cells"][0][0] == "p2cell"


def _unruled_block(y0=400, xs=(110, 190, 270), rows_text=None, size=10) -> bytes:
    """Three whitespace-aligned columns, no rules — 20pt line pitch."""
    rows_text = rows_text or [
        ("name", "lang", "n"),
        ("alpha", "en", "3"),
        ("beta", "de", "7"),
    ]
    ops = []
    for ri, row in enumerate(rows_text):
        y = y0 - 20 * ri
        for x, s in zip(xs, row):
            ops.append(f"BT /F1 {size} Tf {x} {y} Td ({s}) Tj ET".encode())
    return b" ".join(ops)


def test_unruled_whitespace_table_roundtrip():
    tables = extract_pdf_tables(make_pdf(_unruled_block()))
    assert len(tables) == 1
    t = tables[0]
    assert t["kind"] == "unruled" and (t["n_rows"], t["n_cols"]) == (3, 3)
    assert t["cells"] == [
        ["name", "lang", "n"],
        ["alpha", "en", "3"],
        ["beta", "de", "7"],
    ]
    md = table_to_markdown(t)
    assert md.splitlines()[0] == "| name | lang | n |"
    assert "| beta | de | 7 |" in md


def test_mixed_ruled_and_unruled_page():
    ruled = _grid_ops() + b" " + b" ".join(
        [_cell_text(110, 645, "rk"), _cell_text(190, 645, "rv"), _cell_text(270, 645, "ru"),
         _cell_text(110, 625, "r1"), _cell_text(190, 625, "r2"), _cell_text(270, 625, "r3")]
    )
    tables = extract_pdf_tables(make_pdf(ruled + b" " + _unruled_block(y0=400)))
    kinds = [t["kind"] for t in tables]
    assert kinds == ["ruled", "unruled"]  # top of page first
    assert tables[0]["cells"][0] == ["rk", "rv", "ru"]
    assert tables[1]["cells"][0] == ["name", "lang", "n"]
    # the ruled table's text was excluded from unruled detection: exactly 2
    assert len(tables) == 2


def test_prose_lines_do_not_misfire():
    # word-separated runs with ordinary word gaps merge into one chunk
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur"]
    ops = []
    for li in range(5):
        x = 72.0
        y = 700 - 14 * li
        for w in words:
            ops.append(f"BT /F1 12 Tf {x} {y} Td ({w}) Tj ET".encode())
            x += len(w) * 0.5 * 12 + 4  # ~word-space gap, far below col_gap
    assert extract_pdf_tables(make_pdf(b" ".join(ops))) == []


def test_two_column_prose_rejected_by_fill_guard():
    # justified two-column layout: two wide chunks per line with a clean
    # gully between them — the geometry of a 2-col TABLE, but each chunk
    # fills its column, so the cell-fill guard must reject it
    left = "abcdefghijklmnopqrstuvwxyzabcdefgh"  # 34 chars -> 170pt at 10pt
    right = "zyxwvutsrqponmlkjihgfedcbazyxwvuts"
    ops = []
    for li in range(6):
        y = 700 - 14 * li
        ops.append(f"BT /F1 10 Tf 72 {y} Td ({left}) Tj ET".encode())
        ops.append(f"BT /F1 10 Tf 310 {y} Td ({right}) Tj ET".encode())
    assert extract_pdf_tables(make_pdf(b" ".join(ops))) == []


def test_short_unruled_block_is_not_a_table():
    two_rows = _unruled_block(rows_text=[("a", "b", "c"), ("d", "e", "f")])
    assert extract_pdf_tables(make_pdf(two_rows)) == []


def test_unruled_flows_through_parse_kernel():
    from morphik_core_spark.sources.binary import parse_kernels

    pdf = make_pdf(
        b"BT /F1 12 Tf 72 720 Td (Quarterly summary) Tj ET " + _unruled_block()
    )
    with_tables = parse_kernels(pdf_layout=True, pdf_tables=True)["application/pdf"](pdf)
    assert "| name | lang | n |" in with_tables
    assert "Quarterly summary" in with_tables


def test_non_pdf_raises():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_tables(b"definitely not a pdf")


def test_detect_tables_merges_double_rules():
    # a 1pt-thick drawn border produces rule pairs 1pt apart — they must
    # cluster into single grid lines, not double every row/column
    h = [(600.0, 100.0, 340.0), (601.0, 100.0, 340.0),
         (620.0, 100.0, 340.0), (621.0, 100.0, 340.0),
         (640.0, 100.0, 340.0), (641.0, 100.0, 340.0)]
    v = [(100.0, 600.0, 641.0), (101.0, 600.0, 641.0),
         (220.0, 600.0, 641.0), (340.0, 600.0, 641.0)]
    tables = detect_tables([], h, v)
    assert len(tables) == 1
    assert (tables[0]["n_rows"], tables[0]["n_cols"]) == (2, 2)


def test_parse_kernel_appends_markdown_tables():
    from morphik_core_spark.sources.binary import parse_kernels

    ops = (
        b"BT /F1 12 Tf 72 720 Td (Report heading) Tj ET "
        + _grid_ops()
        + b" "
        + b" ".join([_cell_text(110, 645, "k"), _cell_text(190, 645, "v"), _cell_text(270, 645, "u")])
    )
    pdf = make_pdf(ops)
    plain = parse_kernels(pdf_layout=True)["application/pdf"](pdf)
    with_tables = parse_kernels(pdf_layout=True, pdf_tables=True)["application/pdf"](pdf)
    assert "| k | v | u |" not in plain
    assert with_tables.startswith(plain)
    assert "| k | v | u |" in with_tables
    # a table-free PDF is byte-identical under the wrapped kernel
    no_tbl = make_pdf(b"BT /F1 12 Tf 72 720 Td (No tables here) Tj ET")
    assert (
        parse_kernels(pdf_layout=True, pdf_tables=True)["application/pdf"](no_tbl)
        == parse_kernels(pdf_layout=True)["application/pdf"](no_tbl)
    )
