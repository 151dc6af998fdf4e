"""Glyph-box PDF page rasterization — the engine-local restatement of the
reference's ColPali page rendering (reference
core/services/ingestion_service.py:1449-1640 and
document_service.py:1901-2011 render every page to an image at DPI 150 via
pdf2image before multivector embedding).

Full font rendering needs a glyph rasterizer (FreeType) — an external
boundary. What the visual-retrieval path actually consumes is page LAYOUT:
where ink is, line structure, density. This module renders exactly that:
it walks the page tree (MediaBox + Contents per page, with /Parent
inheritance), interprets the text-positioning operators with a real text
matrix (Tm/Td/TD/T*/TL/Tf/Tj/TJ/'/"), and fills one quantized box per
glyph into a grayscale page bitmap at the requested DPI. Embedded image
XObjects placed via `cm ... Do` are painted as mid-gray regions so figures
occupy their true page area. Text-only and vector PDFs therefore produce
one real bitmap per page — the documents that previously vanished from the
ColPali path entirely.

Deterministic, pure-Python + numpy, bounded: page count, bitmap side, and
content-stream size are all capped so a corrupt document cannot OOM an
executor. Used by operators/multimodal.extract_pdf_page_images as the
fallback when a page has no embedded raster (scanned corpora still take
the embedded-DCT fast path).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from morphik_core_spark.functions.pdf import (
    _parse_literal_bytes,
    _stream_filters,
    apply_stream_filters,
    looks_like_pdf,
)

__all__ = ["rasterize_pdf_pages", "parse_page_tree"]

_MAX_PAGES = 256
_MAX_SIDE_PX = 4096
_MAX_CONTENT = 8 << 20  # 8 MiB of decoded content ops per page

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")
_NAME_RE = re.compile(rb"/([^\s/<>\[\]()]+)")

# Helvetica-ish advance widths in text-space units per font-size unit:
# constant-width boxes are enough for layout; space advances but inks no box
_GLYPH_W = 0.5
_SPACE_W = 0.28
_ASCENT = 0.72
_DESCENT = 0.21


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Object number -> body bytes.

    Two layers: the classic ``N G obj ... endobj`` layout (scanned by
    regex instead of the xref table, which tolerates the broken offsets
    real-world PDFs ship), THEN any /Type /ObjStm object streams found
    among those objects are inflated and their packed objects added —
    the PDF 1.5+ layout where page dicts, font dicts, and the catalog
    live compressed inside a stream (only non-stream objects can, so
    content streams always remain directly visible). A cross-reference
    STREAM (/Type /XRef) never needs parsing for this: object numbers
    come from the ObjStm's own N-pair header.
    """
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end == -1:
            continue
        objs[int(m.group(1))] = data[m.end():end]

    for body in list(objs.values()):
        head = _dict_body(body)
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        dec = _decoded_stream(body)
        if dec is None:
            continue
        n_raw = _dict_value(head, b"N")
        first_raw = _dict_value(head, b"First")
        try:
            n = int(n_raw or 0)
            first = int(first_raw or 0)
        except ValueError:
            continue
        if not (0 < n <= 65536 and 0 <= first <= len(dec)):
            continue  # corrupt header: skip the stream, keep the document
        header_nums = _NUM_RE.findall(dec[:first])
        pairs = [
            (int(header_nums[2 * i]), int(header_nums[2 * i + 1]))
            for i in range(min(n, len(header_nums) // 2))
        ]
        for idx, (objnum, off) in enumerate(pairs):
            start = first + off
            stop = first + pairs[idx + 1][1] if idx + 1 < len(pairs) else len(dec)
            if 0 <= start <= stop <= len(dec):
                # direct objects win over packed ones (hybrid/updated files)
                objs.setdefault(objnum, dec[start:stop])
    return objs


def _dict_body(obj: bytes) -> bytes:
    """The top-level << ... >> of an object body (balanced)."""
    start = obj.find(b"<<")
    if start == -1:
        return b""
    depth, i = 0, start
    while i < len(obj) - 1:
        if obj.startswith(b"<<", i):
            depth += 1
            i += 2
        elif obj.startswith(b">>", i):
            depth -= 1
            i += 2
            if depth == 0:
                return obj[start:i]
        else:
            i += 1
    return obj[start:]


def _dict_value(dict_body: bytes, key: bytes) -> bytes | None:
    """Raw value bytes for /Key in a dict body (ref, number, array, name,
    or nested dict) — enough PDF-dict parsing for the page tree."""
    m = re.search(rb"/" + key + rb"(?![A-Za-z0-9])\s*", dict_body)
    if not m:
        return None
    i = m.end()
    if dict_body.startswith(b"[", i):
        depth = 0
        for j in range(i, len(dict_body)):
            if dict_body[j : j + 1] == b"[":
                depth += 1
            elif dict_body[j : j + 1] == b"]":
                depth -= 1
                if depth == 0:
                    return dict_body[i : j + 1]
        return dict_body[i:]
    if dict_body.startswith(b"<<", i):
        return _dict_body(dict_body[i:])
    m2 = re.match(rb"\d+\s+\d+\s+R|/[^\s/<>\[\]()]+|[-+]?\d*\.?\d+", dict_body[i:])
    return m2.group(0) if m2 else None


def _decoded_stream(obj: bytes) -> bytes | None:
    """Decode an object's stream through its declared filter chain."""
    m = re.search(rb"stream\r?\n", obj)
    if not m:
        return None
    end = obj.find(b"endstream", m.end())
    raw = obj[m.end() : end if end != -1 else len(obj)]
    filters = _stream_filters(_dict_body(obj))
    try:
        if filters:
            return apply_stream_filters(raw, filters)
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return raw.rstrip(b"\r\n")
    except ValueError:
        return None


def _walk_kids(node_num: int, objs: dict[int, bytes], acc: list[int], depth: int = 0) -> None:
    if depth > 32 or len(acc) >= _MAX_PAGES or node_num not in objs:
        return
    body = _dict_body(objs[node_num])
    if re.search(rb"/Type\s*/Pages\b", body):
        kids = _dict_value(body, b"Kids") or b""
        for m in _REF_RE.finditer(kids):
            _walk_kids(int(m.group(1)), objs, acc, depth + 1)
    elif re.search(rb"/Type\s*/Page\b", body):
        acc.append(node_num)


def parse_page_tree(data: bytes) -> list[tuple[tuple[float, float, float, float], bytes]]:
    """[(media_box, content_ops)] per page, in page-tree order.

    MediaBox inherits from /Parent (one level is what real files use);
    /Contents may be a single ref or an array (concatenated, as the spec
    requires). Falls back to document-ordered /Type /Page objects when the
    catalog walk finds nothing, and to one pseudo-page of every BT-bearing
    stream when the file has no page objects at all.
    """
    objs = _parse_objects(data)
    page_nums: list[int] = []
    root = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if root and int(root.group(1)) in objs:
        cat = _dict_value(_dict_body(objs[int(root.group(1))]), b"Pages")
        if cat:
            m = _REF_RE.match(cat)
            if m:
                _walk_kids(int(m.group(1)), objs, page_nums)
    if not page_nums:
        page_nums = [n for n, o in sorted(objs.items()) if re.search(rb"/Type\s*/Page\b", _dict_body(o))]
    page_nums = page_nums[:_MAX_PAGES]

    pages = []
    for num in page_nums:
        body = _dict_body(objs[num])
        mb_raw = _dict_value(body, b"MediaBox")
        if mb_raw is None:
            parent = _dict_value(body, b"Parent")
            if parent:
                pm = _REF_RE.match(parent)
                if pm and int(pm.group(1)) in objs:
                    mb_raw = _dict_value(_dict_body(objs[int(pm.group(1))]), b"MediaBox")
        mb = (0.0, 0.0, 612.0, 792.0)
        if mb_raw:
            nums = [float(x) for x in _NUM_RE.findall(mb_raw)]
            if len(nums) >= 4:
                mb = (nums[0], nums[1], nums[2], nums[3])
        content = b""
        contents = _dict_value(body, b"Contents")
        if contents:
            for m in _REF_RE.finditer(contents):
                obj = objs.get(int(m.group(1)))
                if obj is None:
                    continue
                dec = _decoded_stream(obj)
                if dec:
                    content += dec + b"\n"
                if len(content) > _MAX_CONTENT:
                    content = content[:_MAX_CONTENT]
                    break
        pages.append((mb, content))
    if not pages:
        # no page objects: one pseudo-page of all text-bearing streams —
        # object-wrapped first, then bare stream...endstream fragments
        # (the same degraded-document tolerance extract_pdf_text has)
        content = b""
        for _num, obj in sorted(objs.items()):
            dec = _decoded_stream(obj)
            if dec and b"BT" in dec:
                content += dec + b"\n"
        if not content:
            for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, re.DOTALL):
                raw = m.group(1)
                try:
                    dec = zlib.decompress(raw)
                except zlib.error:
                    dec = raw.rstrip(b"\r\n")
                if b"BT" in dec:
                    content += dec + b"\n"
        if content:
            pages.append(((0.0, 0.0, 612.0, 792.0), content[:_MAX_CONTENT]))
    return pages


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _apply(m, x, y):
    a, b, c, d, e, f = m
    return a * x + c * y + e, b * x + d * y + f


def rasterize_page(
    content: bytes,
    media_box: tuple[float, float, float, float],
    dpi: int = 150,
) -> np.ndarray:
    """One page's content ops -> grayscale uint8 bitmap (white=255).

    Interprets the text state machine faithfully enough for layout: the
    text matrix composes with Td/TD/T*/TL exactly per spec; each shown
    glyph inks its transformed box; TJ's numeric kerning adjusts the
    advance by -n/1000*size as the spec defines. `cm ... Do` image
    placements ink a mid-gray rectangle of the CTM's unit square.
    """
    x0, y0, x1, y1 = media_box
    scale = dpi / 72.0
    w_px = max(1, min(_MAX_SIDE_PX, int(round((x1 - x0) * scale))))
    h_px = max(1, min(_MAX_SIDE_PX, int(round((y1 - y0) * scale))))
    page = np.full((h_px, w_px), 255, dtype=np.uint8)

    def ink(quad, value):
        xs = [(px - x0) * scale for px, _ in quad]
        ys = [(y1 - py) * scale for _, py in quad]
        ax, bx = int(np.floor(min(xs))), int(np.ceil(max(xs)))
        ay, by = int(np.floor(min(ys))), int(np.ceil(max(ys)))
        ax, bx = max(ax, 0), min(bx, w_px)
        ay, by = max(ay, 0), min(by, h_px)
        if ax < bx and ay < by:
            region = page[ay:by, ax:bx]
            np.minimum(region, value, out=region)

    ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    ctm = ident
    ctm_stack: list[tuple] = []
    tm = lm = ident
    size = 12.0
    leading = 0.0
    in_text = False
    pend_strings: list[bytes] = []
    operands: list[float] = []

    def show(items) -> None:
        nonlocal tm
        for it in items:
            if isinstance(it, (int, float)):
                tm = _mat_mul((1, 0, 0, 1, -it / 1000.0 * size, 0), tm)
                continue
            for ch in it:
                adv = _SPACE_W * size if ch in (0x20, 0x09) else _GLYPH_W * size
                if ch not in (0x20, 0x09):
                    g = _mat_mul(tm, ctm)
                    quad = [
                        _apply(g, 0, -_DESCENT * size),
                        _apply(g, adv, -_DESCENT * size),
                        _apply(g, adv, _ASCENT * size),
                        _apply(g, 0, _ASCENT * size),
                    ]
                    ink(quad, 0)
                tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in b" \t\r\n":
            i += 1
        elif c == 0x28:  # (string)
            raw, i = _parse_literal_bytes(content, i + 1)
            pend_strings.append(raw)
        elif c == 0x3C and not content.startswith(b"<<", i):  # <hex>
            end = content.find(b">", i + 1)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pend_strings.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = end + 1
        elif c == 0x2F:  # /Name
            m = _NAME_RE.match(content, i)
            i = m.end() if m else i + 1
        elif c == 0x5B:  # [ TJ array start — elements accumulate
            i += 1
        elif c == 0x5D:
            i += 1
        elif chr(c).isdigit() or c in b"+-.":
            m = _NUM_RE.match(content, i)
            if not m:
                i += 1
                continue
            operands.append(float(m.group(0)))
            i = m.end()
        else:
            m = _OP_RE.match(content, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op == b"BT":
                in_text, tm, lm = True, ident, ident
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and operands:
                size = operands[-1]
            elif op == b"TL" and operands:
                leading = operands[-1]
            elif op == b"Tm" and len(operands) >= 6:
                tm = lm = tuple(operands[-6:])
            elif op in (b"Td", b"TD") and len(operands) >= 2:
                tx, ty = operands[-2], operands[-1]
                if op == b"TD":
                    leading = -ty
                lm = _mat_mul((1, 0, 0, 1, tx, ty), lm)
                tm = lm
            elif op == b"T*":
                lm = _mat_mul((1, 0, 0, 1, 0, -leading), lm)
                tm = lm
            elif op == b"Tj" and in_text:
                show(pend_strings)
            elif op == b"TJ" and in_text:
                # strings and the numeric operands interleave; numbers
                # that arrived via the operand stack are TJ adjustments
                show(pend_strings if not operands else _tj_merge(pend_strings, operands))
            elif op in (b"'", b'"') and in_text:
                lm = _mat_mul((1, 0, 0, 1, 0, -leading), lm)
                tm = lm
                show(pend_strings)
            elif op == b"cm" and len(operands) >= 6:
                ctm = _mat_mul(tuple(operands[-6:]), ctm)
            elif op == b"q":
                ctm_stack.append(ctm)
            elif op == b"Q":
                ctm = ctm_stack.pop() if ctm_stack else ident
            elif op == b"Do":
                # image/form placed as the CTM's unit square -> mid-gray
                quad = [_apply(ctm, px, py) for px, py in ((0, 0), (1, 0), (1, 1), (0, 1))]
                ink(quad, 128)
            pend_strings.clear()
            operands.clear()
    return page


def _tj_merge(strings: list[bytes], numbers: list[float]):
    """Interleave TJ strings with kern numbers. Token-level ordering was
    flattened by the scanner, so kerns apply between strings — the layout
    effect (sub-glyph x shifts) is below box-rendering resolution."""
    out: list = []
    for idx, s in enumerate(strings):
        out.append(s)
        if idx < len(numbers):
            out.append(numbers[idx])
    return out


def rasterize_pdf_pages(data: bytes, dpi: int = 150) -> list[np.ndarray]:
    """PDF bytes -> one grayscale uint8 page bitmap per page at `dpi`
    (reference renders at DPI 150). Raises ValueError for non-PDF input;
    a valid PDF with no parseable pages yields []."""
    if not looks_like_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    from morphik_core_spark.functions.pdf_crypt import decrypt_pdf

    data = decrypt_pdf(data)
    return [rasterize_page(content, mb, dpi=dpi) for mb, content in parse_page_tree(data)]


# ----------------------------------------------- layout-aware extraction


def page_text_runs(
    content: bytes, font_cmaps: dict | None = None
) -> list[tuple[float, float, float, float, float, str]]:
    """Interpret a page's text ops into positioned runs:
    [(x0, y0, x1, y1, size, text)] in PDF user space (y up), one run per
    show op. The same text machine as rasterize_page, but decoding the
    strings (CID CMaps included) instead of inking boxes — the substrate
    for reading-order reconstruction."""
    from morphik_core_spark.functions.pdf import _cmap_decode, _decode_string_bytes

    runs: list[tuple[float, float, float, float, float, str]] = []
    ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    ctm = ident
    ctm_stack: list[tuple] = []
    tm = lm = ident
    size = 12.0
    leading = 0.0
    in_text = False
    cur_cmap: dict | None = None
    last_name: str | None = None
    pend: list[bytes] = []
    operands: list[float] = []

    def show(items) -> None:
        nonlocal tm
        for it in items:
            if isinstance(it, (int, float)):
                tm = _mat_mul((1, 0, 0, 1, -it / 1000.0 * size, 0), tm)
                continue
            text = _cmap_decode(it, cur_cmap) if cur_cmap else _decode_string_bytes(it)
            if not text:
                continue
            adv = sum(_SPACE_W if ch == " " else _GLYPH_W for ch in text) * size
            g = _mat_mul(tm, ctm)
            ax0, ay0 = _apply(g, 0.0, -_DESCENT * size)
            ax1, ay1 = _apply(g, adv, _ASCENT * size)
            if text.strip():
                runs.append(
                    (min(ax0, ax1), min(ay0, ay1), max(ax0, ax1), max(ay0, ay1), size, text)
                )
            tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in b" \t\r\n":
            i += 1
        elif c == 0x28:
            raw, i = _parse_literal_bytes(content, i + 1)
            pend.append(raw)
        elif c == 0x3C and not content.startswith(b"<<", i):
            end = content.find(b">", i + 1)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pend.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = end + 1
        elif c == 0x2F:
            m = re.compile(rb"/([A-Za-z0-9.+_-]+)").match(content, i)
            if m:
                last_name = m.group(1).decode("latin-1")
                i = m.end()
            else:
                i += 1
        elif c in (0x5B, 0x5D):
            i += 1
        elif chr(c).isdigit() or c in b"+-.":
            m = _NUM_RE.match(content, i)
            if not m:
                i += 1
                continue
            operands.append(float(m.group(0)))
            i = m.end()
        else:
            m = _OP_RE.match(content, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op == b"BT":
                in_text, tm, lm = True, ident, ident
            elif op == b"ET":
                in_text = False
            elif op == b"Tf":
                if operands:
                    size = operands[-1]
                cur_cmap = (font_cmaps or {}).get(last_name)
            elif op == b"TL" and operands:
                leading = operands[-1]
            elif op == b"Tm" and len(operands) >= 6:
                tm = lm = tuple(operands[-6:])
            elif op in (b"Td", b"TD") and len(operands) >= 2:
                tx, ty = operands[-2], operands[-1]
                if op == b"TD":
                    leading = -ty
                lm = _mat_mul((1, 0, 0, 1, tx, ty), lm)
                tm = lm
            elif op == b"T*":
                lm = _mat_mul((1, 0, 0, 1, 0, -leading), lm)
                tm = lm
            elif op in (b"Tj", b"TJ") and in_text:
                show(pend)
            elif op in (b"'", b'"') and in_text:
                lm = _mat_mul((1, 0, 0, 1, 0, -leading), lm)
                tm = lm
                show(pend)
            elif op == b"cm" and len(operands) >= 6:
                ctm = _mat_mul(tuple(operands[-6:]), ctm)
            elif op == b"q":
                ctm_stack.append(ctm)
            elif op == b"Q":
                ctm = ctm_stack.pop() if ctm_stack else ident
            pend.clear()
            operands.clear()
    return runs


def _gaps(intervals: list[tuple[float, float]], min_gap: float) -> list[float]:
    """Midpoints of gaps wider than min_gap between merged intervals."""
    if not intervals:
        return []
    intervals = sorted(intervals)
    merged = [list(intervals[0])]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1] + min_gap:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(merged[k][1] + merged[k + 1][0]) / 2.0 for k in range(len(merged) - 1)]


def _xy_cut(runs: list, depth: int = 0) -> list:
    """Recursive XY-cut reading order (Nagy et al.'s classic document
    layout algorithm): split on the widest whitespace gully — horizontal
    cuts first (top-to-bottom bands), then vertical (left-to-right
    columns) — and recurse; leaves fall back to line clustering. This is
    what turns a two-column paper into left-column-then-right-column
    text, the reading-order half of layout-aware parsing (reference
    delegates it to Docling, morphik_parser.py:295-346)."""
    if len(runs) <= 1 or depth > 16:
        return _line_order(runs)
    med_size = sorted(r[4] for r in runs)[len(runs) // 2]
    y_cuts = _gaps([(r[1], r[3]) for r in runs], min_gap=med_size * 0.9)
    if y_cuts:
        bands: dict[int, list] = {}
        for r in runs:
            yc = (r[1] + r[3]) / 2.0
            band = sum(1 for cut in y_cuts if yc < cut)  # 0 = topmost band
            bands.setdefault(band, []).append(r)
        out = []
        for band in sorted(bands):  # top (y above all cuts) first
            out.extend(_xy_cut(bands[band], depth + 1))
        return out
    x_cuts = _gaps([(r[0], r[2]) for r in runs], min_gap=med_size * 1.6)
    if x_cuts:
        cols: dict[int, list] = {}
        for r in runs:
            xc = (r[0] + r[2]) / 2.0
            col = sum(1 for cut in x_cuts if xc > cut)  # 0 = leftmost
            cols.setdefault(col, []).append(r)
        out = []
        for col in sorted(cols):
            out.extend(_xy_cut(cols[col], depth + 1))
        return out
    return _line_order(runs)


def _line_order(runs: list) -> list:
    """Cluster runs into baselines (y tolerance ~ half the median size),
    top line first, left-to-right within a line; a LINE-BREAK sentinel
    run separates lines for the assembler."""
    if not runs:
        return []
    med_size = sorted(r[4] for r in runs)[len(runs) // 2]
    tol = med_size * 0.6
    lines: list[list] = []
    for r in sorted(runs, key=lambda r: (-r[1], r[0])):
        for line in lines:
            if abs(line[0][1] - r[1]) <= tol:
                line.append(r)
                break
        else:
            lines.append([r])
    lines.sort(key=lambda line: -max(x[3] for x in line))
    out = []
    for line in lines:
        out.extend(sorted(line, key=lambda r: r[0]))
        out.append(None)  # line break sentinel
    return out


def _assemble(ordered: list) -> str:
    parts: list[str] = []
    prev = None
    for r in ordered:
        if r is None:
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
            prev = None
            continue
        if prev is not None:
            gap = r[0] - prev[2]
            if gap > prev[4] * 0.2 and not prev[5].endswith(" ") and not r[5].startswith(" "):
                parts.append(" ")
        parts.append(r[5])
        prev = r
    return "".join(parts).strip("\n")


def extract_pdf_text_layout(data: bytes) -> str:
    """Layout-aware PDF text extraction: positioned runs -> XY-cut
    reading order -> line assembly, per page, pages joined by form feed.

    Where `extract_pdf_text` emits show-operator order (fast, faithful
    for linear PDFs), this reconstructs READING order from geometry, so
    multi-column layouts and out-of-order content streams come out as a
    human reads them — the engine-local answer to the reference's
    Docling reading-order pass (morphik_parser.py:295-346). Raises
    ValueError for non-PDFs or when no text is recovered, same row-level
    contract as extract_pdf_text."""
    if not looks_like_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    from morphik_core_spark.functions.pdf import _collect_font_cmaps
    from morphik_core_spark.functions.pdf_crypt import decrypt_pdf

    data = decrypt_pdf(data)
    font_cmaps = _collect_font_cmaps(data)
    pages_text = []
    for _mb, content in parse_page_tree(data):
        runs = page_text_runs(content, font_cmaps)
        if runs:
            pages_text.append(_assemble(_xy_cut(runs)))
    text = "\f".join(t for t in pages_text if t).strip()
    if not text:
        raise ValueError("no extractable text (encrypted/image-only/unsupported encoding)")
    return text
