"""Legacy binary Office extraction (.doc Word 97-2003, .xls BIFF8).

The reference converts these via LibreOffice
(/root/reference/core/parser/morphik_parser.py:527-616); with no external
binaries available, the public specs ([MS-DOC], [MS-XLS]) are implemented
directly on top of the CFB container reader (functions/cfb.py):

- ``extract_doc_text``: walks the FIB → CLX piece table (handles mixed
  cp1252/UTF-16 pieces), falling back to the fcMin..fcMac run with an
  encoding heuristic when the piece table is absent/broken. Covers
  non-complex and piece-tabled documents; OLE-embedded subdocuments and
  fields are stripped, not resolved.
- ``extract_xls_markdown``: BIFF8 record walk — BOUNDSHEET order, SST
  with CONTINUE-record string splitting (including the re-emitted
  compression flag mid-string), LABELSST / LABEL / NUMBER / RK / MULRK /
  BOOLERR cells — emitted in the same markdown-table shape as the
  OOXML fast path (functions/office.extract_xlsx_markdown).

Both raise ValueError on anything unrecognized so rows isolate.
"""

from __future__ import annotations

import re
import struct

from morphik_core_spark.functions.cfb import CfbFile

__all__ = ["extract_doc_text", "extract_xls_markdown"]


# ------------------------------------------------------------------ .doc

_WORD_MAGIC = 0xA5EC


def _clean_word_text(t: str) -> str:
    t = t.replace("\r\n", "\n").replace("\r", "\n").replace("\x0b", "\n").replace("\x0c", "\n")
    t = t.replace("\x07", "\t")  # table cell/row marks -> tabs
    return re.sub(r"[\x00-\x08\x0e-\x1f]", "", t)


def _text_from_clx(clx: bytes, wd: bytes, ccp_text: int) -> str:
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc (property modifiers) — skip
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("no piece table in CLX")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb]
    n = (lcb - 4) // 12
    if n <= 0 or len(plc) < lcb:
        raise ValueError("empty/truncated piece table")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for k in range(n):
        # Pcd = flags u16, fc u32 (bit 30: 8-bit text at fc/2), prm u16
        (fc,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * k + 2)
        nch = cps[k + 1] - cps[k]
        if fc & 0x40000000:
            off = (fc & 0x3FFFFFFF) // 2
            pieces.append(wd[off : off + nch].decode("cp1252", "replace"))
        else:
            off = fc & 0x3FFFFFFF
            pieces.append(wd[off : off + 2 * nch].decode("utf-16-le", "replace"))
    return "".join(pieces)[:ccp_text]


def extract_doc_text(data: bytes) -> str:
    """.doc bytes → plain text (main document part)."""
    cfb = CfbFile(data)
    wd = cfb.stream("WordDocument")
    if len(wd) < 0x200 or struct.unpack_from("<H", wd, 0)[0] != _WORD_MAGIC:
        raise ValueError("not a Word 97-2003 (.doc) document")
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    fc_min, fc_mac = struct.unpack_from("<II", wd, 0x18)
    (ccp_text,) = struct.unpack_from("<I", wd, 76)

    text = None
    try:
        tbl = cfb.stream("1Table" if flags & 0x0200 else "0Table", "1Table", "0Table")
        fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
        if lcb_clx and fc_clx + lcb_clx <= len(tbl):
            text = _text_from_clx(tbl[fc_clx : fc_clx + lcb_clx], wd, ccp_text)
    except ValueError:
        text = None
    if text is None:
        # non-complex fallback: contiguous text at fcMin..fcMac; pick the
        # encoding by the odd-byte-zero signature of UTF-16 latin text
        raw = wd[fc_min:fc_mac]
        if not raw:
            raise ValueError("no extractable .doc text")
        odd_zeros = raw[1::2].count(0)
        if len(raw) >= 2 and odd_zeros * 2 >= len(raw) // 2:
            text = raw.decode("utf-16-le", "replace")
        else:
            text = raw.decode("cp1252", "replace")
        if ccp_text:
            text = text[:ccp_text]
    out = _clean_word_text(text)
    if not out.strip():
        raise ValueError("no extractable .doc text")
    return out


# ------------------------------------------------------------------ .xls


class _SstCursor:
    """Byte cursor over SST + CONTINUE payloads. Fixed-width fields span
    record boundaries transparently; character runs that split mid-string
    re-read the compression flag at the boundary ([MS-XLS] 2.5.293)."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.pi = 0
        self.off = 0

    def _advance(self) -> None:
        while self.pi < len(self.parts) and self.off >= len(self.parts[self.pi]):
            self.pi += 1
            self.off = 0

    def at_end(self) -> bool:
        self._advance()
        return self.pi >= len(self.parts)

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.pi >= len(self.parts):
                raise ValueError("truncated SST")
            part = self.parts[self.pi]
            take = min(n, len(part) - self.off)
            out += part[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        (cch,) = struct.unpack("<H", self.read(2))
        grbit = self.read(1)[0]
        rich = grbit & 0x08
        ext = grbit & 0x04
        c_run = struct.unpack("<H", self.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<i", self.read(4))[0] if ext else 0
        chars: list[str] = []
        wide = bool(grbit & 0x01)
        left = cch
        while left > 0:
            self._advance()
            if self.pi >= len(self.parts):
                raise ValueError("truncated SST string")
            if self.off == 0 and chars:
                # continuation boundary mid-string: fresh compression flag
                wide = bool(self.read(1)[0] & 0x01)
            avail = len(self.parts[self.pi]) - self.off
            width = 2 if wide else 1
            take = min(left, avail // width)
            if take == 0:
                raise ValueError("SST string split inside a character")
            raw = self.read(take * width)
            chars.append(raw.decode("utf-16-le" if wide else "latin-1", "replace"))
            left -= take
        if c_run:
            self.read(4 * c_run)
        if cb_ext:
            self.read(cb_ext)
        return "".join(chars)


def _records(buf: bytes, start: int = 0):
    i = start
    while i + 4 <= len(buf):
        op, ln = struct.unpack_from("<HH", buf, i)
        yield op, buf[i + 4 : i + 4 + ln], i
        i += 4 + ln


def _rk_value(v: int) -> float:
    num = (
        float(struct.unpack("<i", struct.pack("<I", v))[0] >> 2)
        if v & 2
        else struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", v & 0xFFFFFFFC))[0]
    )
    return num / 100.0 if v & 1 else num


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else str(v)


def extract_xls_markdown(data: bytes) -> str:
    """.xls (BIFF8) bytes → markdown tables, one section per sheet."""
    cfb = CfbFile(data)
    wb = cfb.stream("Workbook", "Book")

    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    sst: list[str] = []
    sst_parts: list[bytes] | None = None
    for op, body, _off in _records(wb):
        if op == 0x0085:  # BOUNDSHEET
            (pos,) = struct.unpack_from("<I", body, 0)
            cch, grbit_chr = body[6], body[7]
            name = (
                body[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
                if grbit_chr & 1
                else body[8 : 8 + cch].decode("latin-1", "replace")
            )
            sheets.append((name, pos))
        elif op == 0x00FC:  # SST
            sst_parts = [body[8:]]  # skip cstTotal/cstUnique
            (self_total,) = struct.unpack_from("<I", body, 4)
            sst_unique = self_total
        elif op == 0x003C and sst_parts is not None and not sst:
            sst_parts.append(body)
        elif op == 0x000A and sst_parts is not None and not sst:  # EOF of globals
            cur = _SstCursor(sst_parts)
            for _ in range(sst_unique):
                if cur.at_end():
                    break
                sst.append(cur.read_string())
            sst_parts = None  # done; later CONTINUEs belong to other records

    if not sheets:
        raise ValueError("not a BIFF8 workbook (no BOUNDSHEET records)")

    parts: list[str] = []
    for name, pos in sheets:
        cells: dict[int, dict[int, str]] = {}

        def put(row: int, col: int, val: str) -> None:
            cells.setdefault(row, {})[col] = val

        depth = 0
        for op, body, _off in _records(wb, pos):
            if op == 0x0809:
                depth += 1
            elif op == 0x000A:
                depth -= 1
                if depth <= 0:
                    break
            elif op == 0x00FD:  # LABELSST
                row, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
                put(row, col, sst[isst] if isst < len(sst) else "")
            elif op == 0x0204:  # LABEL (inline)
                row, col = struct.unpack_from("<HH", body, 0)
                cch, grbit = struct.unpack_from("<HB", body, 6)
                raw = body[9 : 9 + (2 * cch if grbit & 1 else cch)]
                put(row, col, raw.decode("utf-16-le" if grbit & 1 else "latin-1", "replace"))
            elif op == 0x0203:  # NUMBER
                row, col, _ixfe = struct.unpack_from("<HHH", body, 0)
                (v,) = struct.unpack_from("<d", body, 6)
                put(row, col, _fmt_num(v))
            elif op == 0x027E:  # RK
                row, col, _ixfe, rk = struct.unpack_from("<HHHI", body, 0)
                put(row, col, _fmt_num(_rk_value(rk)))
            elif op == 0x00BD:  # MULRK
                row, col_first = struct.unpack_from("<HH", body, 0)
                n = (len(body) - 6) // 6
                for j in range(n):
                    (rk,) = struct.unpack_from("<I", body, 4 + 6 * j + 2)
                    put(row, col_first + j, _fmt_num(_rk_value(rk)))
            elif op == 0x0205:  # BOOLERR
                row, col, _ixfe, val, is_err = struct.unpack_from("<HHHBB", body, 0)
                put(row, col, "" if is_err else ("TRUE" if val else "FALSE"))

        if not cells:
            continue
        parts.append(f"## {name}\n")
        rows = sorted(cells)
        max_cols = max(max(c.keys()) for c in cells.values()) + 1
        for ri, r in enumerate(rows):
            vals = [(cells[r].get(c, "") or "").replace("|", "\\|") for c in range(max_cols)]
            parts.append("| " + " | ".join(vals) + " |")
            if ri == 0:
                parts.append("| " + " | ".join(["---"] * max_cols) + " |")
        parts.append("")

    text = "\n".join(parts)
    if not text.strip():
        raise ValueError("no extractable sheet content")
    return text
