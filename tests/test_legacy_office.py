"""CFB container + legacy .doc/.xls extraction, fixtures built from the
public specs so no real Office files (or LibreOffice) are needed."""

from __future__ import annotations

import struct

import pytest

from morphik_core_spark.functions.cfb import CfbFile, write_cfb
from morphik_core_spark.functions.legacy_office import extract_doc_text, extract_xls_markdown

# ------------------------------------------------------------------ CFB


def test_cfb_roundtrip_mini_and_fat_paths():
    streams = {
        "Big": b"B" * 9000,          # regular FAT chain
        "Small": b"tiny stream",     # mini-FAT chain
        "Mid": b"m" * 3000,          # multi-mini-sector
    }
    f = CfbFile(write_cfb(streams))
    assert {k: f.stream(k) for k in streams} == streams


def test_cfb_rejects_non_ole():
    with pytest.raises(ValueError, match="CFB"):
        CfbFile(b"PK\x03\x04 this is a zip, not OLE2" * 30)


# ------------------------------------------------------------------ .doc


def _doc_fixture(pieces: list[tuple[str, bool]], with_piece_table: bool = True) -> bytes:
    """Build a minimal Word97 CFB: FIB + text area in WordDocument, CLX in
    1Table. ``pieces`` = [(text, is_unicode)]."""
    text_off = 2048
    blob = bytearray()
    fcs: list[int] = []
    cps = [0]
    for text, uni in pieces:
        if uni:
            fcs.append(text_off + len(blob))
            blob += text.encode("utf-16-le")
        else:
            fcs.append(0x40000000 | ((text_off + len(blob)) * 2))
            blob += text.encode("cp1252")
        cps.append(cps[-1] + len(text))

    wd = bytearray(text_off)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 193)  # nFib: Word 97
    struct.pack_into("<H", wd, 0x0A, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<I", wd, 76, cps[-1])  # ccpText

    if with_piece_table:
        plc = b"".join(struct.pack("<I", c) for c in cps)
        pcds = b"".join(struct.pack("<HIH", 0, fc, 0) for fc in fcs)
        plcpcd = plc + pcds
        # a leading Prc must be skipped before the 0x02 Pcdt
        clx = b"\x01" + struct.pack("<h", 2) + b"zz" + b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd
        tbl = b"\x00" * 16 + clx
        struct.pack_into("<II", wd, 0x01A2, 16, len(clx))
    else:
        # non-complex fallback region
        struct.pack_into("<II", wd, 0x18, text_off, text_off + len(blob))
        tbl = b"\x00" * 16
    return write_cfb({"WordDocument": bytes(wd) + bytes(blob), "1Table": tbl})


def test_doc_piece_table_mixed_encodings():
    doc = _doc_fixture(
        [("Hello legacy Word.\r", False), ("Ünïcode piece — em-dash.\r", True), ("tail", False)]
    )
    text = extract_doc_text(doc)
    assert text == "Hello legacy Word.\nÜnïcode piece — em-dash.\ntail"


def test_doc_table_cell_marks_become_tabs():
    doc = _doc_fixture([("a\x07b\x07\rrow2\r", False)])
    assert extract_doc_text(doc) == "a\tb\t\nrow2\n"


def test_doc_fallback_without_piece_table():
    ansi = _doc_fixture([("plain fallback text\r", False)], with_piece_table=False)
    assert extract_doc_text(ansi) == "plain fallback text\n"
    uni = _doc_fixture([("unicode fallback\r", True)], with_piece_table=False)
    # fallback reads bytes: the utf-16 piece doubles its length, so ccpText
    # truncation applies after decode
    assert extract_doc_text(uni).startswith("unicode fallback")


def test_doc_rejects_non_word():
    with pytest.raises(ValueError, match="Word"):
        extract_doc_text(write_cfb({"WordDocument": b"\x00" * 4096}))


# ------------------------------------------------------------------ .xls


def _rec(op: int, body: bytes) -> bytes:
    return struct.pack("<HH", op, len(body)) + body


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst_records(strings: list[str], split_last_mid: bool) -> bytes:
    header = struct.pack("<II", len(strings), len(strings))
    enc = [struct.pack("<HB", len(s), 0) + s.encode("latin-1") for s in strings]
    if not split_last_mid:
        return _rec(0x00FC, header + b"".join(enc))
    # split the LAST string mid-characters: CONTINUE re-emits the
    # compression flag byte before the remaining chars
    last = strings[-1]
    head = struct.pack("<HB", len(last), 0) + last[:3].encode("latin-1")
    cont = b"\x00" + last[3:].encode("latin-1")
    return _rec(0x00FC, header + b"".join(enc[:-1]) + head) + _rec(0x003C, cont)


def _xls_fixture(split_sst: bool = False) -> bytes:
    strings = ["name", "qty", "widget gadget spinner"]
    sheets = [("Data", None), ("Empty2", None)]

    def sheet_data() -> bytes:
        out = _bof(0x0010)
        out += _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))  # LABELSST 'name'
        out += _rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))  # 'qty'
        out += _rec(0x0204, struct.pack("<HHH", 0, 2, 0) + struct.pack("<HB", 4, 0) + b"note")
        out += _rec(0x00FD, struct.pack("<HHHI", 1, 0, 0, 2))
        out += _rec(0x0203, struct.pack("<HHH", 1, 1, 0) + struct.pack("<d", 2.5))
        out += _rec(0x027E, struct.pack("<HHHI", 2, 0, 0, (7 << 2) | 2))  # RK int 7
        # MULRK: RK 100 (int) and RK 1.25 (int 500, div-100)
        out += _rec(
            0x00BD,
            struct.pack("<HH", 2, 1)
            + struct.pack("<HI", 0, (100 << 2) | 2)
            + struct.pack("<HI", 0, (125 << 2) | 3)
            + struct.pack("<H", 2),
        )
        out += _rec(0x0205, struct.pack("<HHHBB", 3, 0, 0, 1, 0))  # TRUE
        out += _rec(0x000A, b"")
        return out

    body_sheets = [sheet_data(), _bof(0x0010) + _rec(0x000A, b"")]

    def globals_block(positions: list[int]) -> bytes:
        out = _bof(0x0005)
        for (name, _), pos in zip(sheets, positions):
            out += _rec(
                0x0085,
                struct.pack("<IHBB", pos, 0, len(name), 0) + name.encode("latin-1"),
            )
        out += _sst_records(strings, split_sst)
        out += _rec(0x000A, b"")
        return out

    # two-pass: globals size is independent of the patched positions
    size = len(globals_block([0] * len(sheets)))
    positions, acc = [], size
    for b in body_sheets:
        positions.append(acc)
        acc += len(b)
    wb = globals_block(positions) + b"".join(body_sheets)
    return write_cfb({"Workbook": wb})


@pytest.mark.parametrize("split_sst", [False, True])
def test_xls_markdown_cells_and_sst(split_sst):
    md = extract_xls_markdown(_xls_fixture(split_sst=split_sst))
    lines = md.splitlines()
    assert lines[0] == "## Data"
    assert "| name | qty | note |" in md
    assert "| --- | --- | --- |" in md
    assert "| widget gadget spinner | 2.5 |  |" in md
    assert "| 7 | 100 | 1.25 |" in md  # RK int + MULRK int + MULRK div-100
    assert "| TRUE |  |  |" in md
    assert "Empty2" not in md  # sheets with no cells are skipped


def test_xls_rejects_non_biff():
    with pytest.raises(ValueError):
        extract_xls_markdown(write_cfb({"Workbook": b"\x00" * 1000}))


# ------------------------------------------------- ingestion routing e2e


def test_legacy_formats_flow_through_file_ingestion(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs

    (tmp_path / "a.doc").write_bytes(_doc_fixture([("legacy word body\r", False)]))
    (tmp_path / "b.xls").write_bytes(_xls_fixture())
    (tmp_path / "c.doc").write_bytes(b"junk that is not OLE2 at all")
    files = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.filename: r for r in files_to_raw_docs(files).collect()}
    assert rows["a.doc"].parse_status == "ok" and "legacy word body" in rows["a.doc"].text
    assert rows["b.xls"].parse_status == "ok" and "widget gadget spinner" in rows["b.xls"].text
    assert rows["c.doc"].parse_status == "parse_failed" and rows["c.doc"].text is None
