"""Pure-Python/numpy baseline JPEG codec.

The reference ingests JPEGs and PDF page renders through PIL
(/root/reference/core/services/ingestion_service.py:1365-1448); this
container has no image libraries, so baseline sequential JPEG (the format
~all real document corpora contain) is decoded for real here:

- **decode_jpeg**: JFIF/EXIF sequential (SOF0/SOF1) AND progressive
  (SOF2), 8-bit, 1 or 3 components, any sampling factors (4:4:4 / 4:2:2 /
  4:2:0 ...), multi-table DQT/DHT segments, restart markers, byte
  unstuffing. Progressive covers all four scan types: DC first/refine
  (interleaved or not), AC spectral-selection first with EOB runs, and
  AC successive-approximation refinement (T.81 G.1.2). Arithmetic coding
  and 12-bit precision raise ValueError — callers isolate the row, same
  policy as every other parser in this repo.
- **encode_jpeg_baseline**: fixture-grade encoder (Annex K quantization +
  Huffman tables, optional 2x2 chroma subsampling and restart interval)
  so decoder paths — including RST resync and chroma upsampling — are
  testable without external fixtures, mirroring encode_png.
- **encode_jpeg_progressive**: fixture-grade SOF2 encoder (4-phase scan
  script, EOB-run accumulation, decoder-traversal-ordered correction-bit
  buffering) so every progressive path round-trips libless; a progressive
  encode decodes bit-identically to the baseline encode of the same
  source (asserted under hypothesis).

Everything per-pixel is vectorized (IDCT via one einsum over all blocks,
color convert in one expression); only the entropy decode is a Python
loop, which is inherent to Huffman and fine at the 256-px feature size
the multimodal operators use.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_baseline", "encode_jpeg_progressive"]

# zigzag index k -> natural (row-major) index, standard order (ITU T.81 fig 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u pi/16),
# c(0)=1/sqrt(2). spatial = A.T @ coeffs @ A ; coeffs = A @ spatial @ A.T
# corrupt-header allocation cap (see tiff.py: fail, never memset GBs)
_MAX_PIXELS = 1 << 26

_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients -> (N, 8, 8) spatial samples."""
    return np.einsum("ux,nuv,vy->nxy", _A, coeffs, _A, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)


# ------------------------------------------------------------------ decode


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.bits.shape[0]:
            raise ValueError("truncated JPEG entropy data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.shape[0]:
            raise ValueError("truncated JPEG entropy data")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: map s low bits to the signed difference value
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff 0xFF00 and split the scan on RST markers; returns segments
    and the index of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # EOI or next real marker
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Sequential (SOF0/SOF1) or progressive (SOF2) JPEG -> (H, W, 3) RGB."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")

    qt: dict[int, np.ndarray] = {}  # id -> 64 values in NATURAL order
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    progressive = False
    store: dict[int, np.ndarray] | None = None  # cid -> (rows, cols, 64) coefs
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len

        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals
                qt[tq] = nat
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack_from(">HH", body, 1)
            if h <= 0 or w <= 0 or h * w > _MAX_PIXELS:
                raise ValueError(f"JPEG dimensions out of range ({w}x{h})")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding process")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = body[p + 17 : p + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_list = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                scan_list.append((cs, tda >> 4, tda & 0x0F))
            if not progressive:
                scan_tables = {cs: (td, ta) for cs, td, ta in scan_list}
                return _decode_scan(data, i, frame, qt, huff, scan_tables, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if store is None:
                store = _init_coef_store(frame)
            i = _decode_progressive_scan(
                data, i, frame, huff, store, scan_list,
                ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
            )
        # else: APPn / COM / DNL etc — skipped

    if progressive and store is not None:
        return _finish_progressive(frame, qt, store)
    raise ValueError("malformed JPEG (no SOS)")


def _decode_scan(data, start, frame, qt, huff, scan_tables, restart_interval):
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    segments, _end = _split_entropy_segments(data, start)
    reader = _BitReader(segments[0])
    seg_idx = 0

    # per-component block storage in MCU-interleaved order
    blocks = {cid: [] for cid, _, _, _ in comps}
    pred = {cid: 0 for cid, _, _, _ in comps}

    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("truncated JPEG (missing restart segment)")
                reader = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid, _, _, _ in comps}
            for cid, ch, cv, tq_id in comps:
                dc_tab = huff.get((0, scan_tables[cid][0]))
                ac_tab = huff.get((1, scan_tables[cid][1]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing JPEG Huffman table")
                for _b in range(ch * cv):
                    coef = np.zeros(64, dtype=np.int32)
                    s = _decode_symbol(reader, dc_tab)
                    diff = _extend(reader.read_bits(s), s)
                    pred[cid] += diff
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(reader, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: skip 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index out of range")
                        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                        k += 1
                    blocks[cid].append(coef)
            mcu_count += 1

    # dequantize + IDCT + assemble per-component planes
    planes = {}
    for cid, ch, cv, tq_id in comps:
        coefs = np.stack(blocks[cid]).reshape(-1, 64) * qt[tq_id][None, :]
        spatial = _idct_blocks(coefs.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.uint8)
        bi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(ch):
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                        bi += 1
        # upsample to full resolution (nearest, the classic fast path)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes[cid] = plane[:height, :width]

    return _color_convert(planes, comps)


def _color_convert(planes: dict, comps) -> np.ndarray:
    if len(comps) == 1:
        g = planes[comps[0][0]]
        return np.repeat(g[..., None], 3, axis=2)
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------- progressive decode


def _geometry(frame):
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _comp_real_blocks(frame, cid):
    """Non-padded block grid (rows, cols) of one component — the grid
    non-interleaved progressive scans iterate (T.81 A.2.2)."""
    height, width, comps = frame
    hmax, vmax, _, _ = _geometry(frame)
    ch, cv = next((c[1], c[2]) for c in comps if c[0] == cid)
    cw = -(-(width * ch) // hmax)
    chh = -(-(height * cv) // vmax)
    return -(-chh // 8), -(-cw // 8)


def _init_coef_store(frame):
    _, _, comps = frame
    hmax, vmax, mcus_x, mcus_y = _geometry(frame)
    return {
        cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        for cid, ch, cv, _ in comps
    }


def _refine_nonzero(coef, reader, zz_from, zz_to, delta):
    """Correction-bit pass over the already-nonzero coefs in the band."""
    for k in range(zz_from, zz_to + 1):
        z = ZIGZAG[k]
        v = int(coef[z])
        if v != 0:
            if reader.read_bit():
                if v > 0 and (v & delta) == 0:
                    coef[z] = v + delta
                elif v < 0 and ((-v) & delta) == 0:
                    coef[z] = v - delta


def _decode_progressive_scan(
    data, start, frame, huff, store, scan_list, ss, se, ah, al, restart_interval
):
    """One SOF2 scan (DC/AC x first/refine) into the coefficient store;
    returns the offset just past the scan's entropy data."""
    _, _, comps = frame
    by_id = {c[0]: c for c in comps}
    segments, end = _split_entropy_segments(data, start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    interleaved = len(scan_list) > 1

    def next_segment():
        nonlocal seg_idx, reader
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("truncated JPEG (missing restart segment)")
        reader = _BitReader(segments[seg_idx])

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("invalid progressive DC scan (Se must be 0)")
        pred = {cs: 0 for cs, _, _ in scan_list}
        hmax, vmax, mcus_x, mcus_y = _geometry(frame)
        if interleaved:
            units = []
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    unit = []
                    for cs, td, _ in scan_list:
                        _, ch, cv, _tq = by_id[cs]
                        for by in range(cv):
                            for bx in range(ch):
                                unit.append((cs, td, _my * cv + by, _mx * ch + bx))
                    units.append(unit)
        else:
            cs, td, _ = scan_list[0]
            rows, cols = _comp_real_blocks(frame, cs)
            units = [[(cs, td, r, c)] for r in range(rows) for c in range(cols)]
        for u, unit in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                next_segment()
                pred = {cs: 0 for cs, _, _ in scan_list}
            for cs, td, r, c in unit:
                coef = store[cs][r, c]
                if ah == 0:
                    tab = huff.get((0, td))
                    if tab is None:
                        raise ValueError("missing JPEG Huffman table")
                    s = _decode_symbol(reader, tab)
                    pred[cs] += _extend(reader.read_bits(s), s)
                    coef[0] = pred[cs] << al
                else:
                    if reader.read_bit():
                        coef[0] = int(coef[0]) | (1 << al)
        return end

    # AC scan: always a single component (T.81 B.2.3)
    if interleaved:
        raise ValueError("interleaved progressive AC scan is invalid")
    cs, _, ta = scan_list[0]
    tab = huff.get((1, ta))
    if tab is None:
        raise ValueError("missing JPEG Huffman table")
    rows, cols = _comp_real_blocks(frame, cs)
    grid = store[cs]
    delta = 1 << al
    eobrun = 0
    for u in range(rows * cols):
        if restart_interval and u and u % restart_interval == 0:
            next_segment()
            eobrun = 0
        coef = grid[u // cols, u % cols]
        if ah == 0:  # AC first
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_symbol(reader, tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC index out of range")
                coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:  # AC refinement (T.81 G.1.2.3)
            if eobrun > 0:
                _refine_nonzero(coef, reader, ss, se, delta)
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_symbol(reader, tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        # EOB run counts this block too: finish its band
                        # with correction bits now, store the REMAINING
                        # blocks in eobrun
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        _refine_nonzero(coef, reader, k, se, delta)
                        break
                    newval = 0
                elif s == 1:
                    newval = delta if reader.read_bit() else -delta
                else:
                    raise ValueError("invalid refinement magnitude")
                # traverse: refine nonzero-history coefs, count down zero
                # positions, then place the newly-significant value
                while k <= se:
                    z = ZIGZAG[k]
                    v = int(coef[z])
                    if v != 0:
                        if reader.read_bit():
                            if v > 0 and (v & delta) == 0:
                                coef[z] = v + delta
                            elif v < 0 and ((-v) & delta) == 0:
                                coef[z] = v - delta
                    else:
                        if r == 0:
                            if newval:
                                coef[z] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
    return end


def _finish_progressive(frame, qt, store):
    height, width, comps = frame
    hmax, vmax, _, _ = _geometry(frame)
    planes = {}
    for cid, ch, cv, tq_id in comps:
        grid = store[cid]
        rows, cols, _ = grid.shape
        coefs = grid.reshape(-1, 64) * qt[tq_id][None, :]
        spatial = _idct_blocks(coefs.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes[cid] = plane[:height, :width]
    return _color_convert(planes, comps)


# ------------------------------------------------------------------ encode
# Annex K (ITU T.81) example tables — the de-facto standard everyone ships.

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bytes(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _encode_table(spec) -> dict[int, tuple[int, int]]:
    counts, symbols = spec
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, coef_zz, pred, dc_tab, ac_tab):
    diff = int(coef_zz[0]) - pred
    s = _category(diff)
    length, code = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(coef_zz[0])


def _prep_quant(px: np.ndarray, subsample: bool, grayscale: bool):
    """Color-convert, subsample, pad, DCT, quantize: the shared front half
    of both encoders. Returns (h, w, samp, zz_blocks, mcus_x, mcus_y)."""
    h, w, _ = px.shape
    f = px.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0

    if grayscale:
        samp = [(1, 1, 1)]
    elif subsample:
        # average 2x2 blocks (pad to even first)
        def down(p):
            ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            return (ph[0::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0

        cb, cr = down(cb), down(cr)
        samp = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    else:
        samp = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]

    hmax = max(s[1] for s in samp)
    vmax = max(s[2] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = {1: y, 2: cb, 3: cr}
    qtabs = {1: _Q_LUMA, 2: _Q_CHROMA, 3: _Q_CHROMA}
    # pad each plane to its MCU-aligned size and pre-quantize all blocks
    zz_blocks: dict[int, tuple[np.ndarray, int]] = {}
    for cid, ch, cv in samp:
        p = planes[cid]
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge") - 128.0
        nby, nbx = ph // 8, pw // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coefs = _fdct_blocks(blocks)
        qnat = qtabs[cid].reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / qnat[None]).astype(np.int32).reshape(-1, 64)
        zz = quant[:, ZIGZAG]
        zz_blocks[cid] = (zz, nbx)
    return h, w, samp, zz_blocks, mcus_x, mcus_y


def encode_jpeg_baseline(
    px: np.ndarray, subsample: bool = False, restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (Annex K tables).
    subsample=True emits 4:2:0 chroma; restart_interval>0 emits DRI+RSTn;
    grayscale=True emits a single-component (luma-only) stream."""
    h, w, samp, zz_blocks, mcus_x, mcus_y = _prep_quant(px, subsample, grayscale)

    dc_tabs = {1: _encode_table(_DC_LUMA), 2: _encode_table(_DC_CHROMA), 3: _encode_table(_DC_CHROMA)}
    ac_tabs = {1: _encode_table(_AC_LUMA), 2: _encode_table(_AC_CHROMA), 3: _encode_table(_AC_CHROMA)}

    bw = _BitWriter()
    scan = bytearray()
    pred = {1: 0, 2: 0, 3: 0}
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                scan += bw.out
                bw = _BitWriter()
                scan += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {1: 0, 2: 0, 3: 0}
            for cid, ch, cv in samp:
                zz, nbx = zz_blocks[cid]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * nbx + (mx * ch + bx)
                        pred[cid] = _encode_block(bw, zz[bi], pred[cid], dc_tabs[cid], ac_tabs[cid])
            mcu_count += 1
    bw.flush()
    scan += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(_Q_LUMA[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(_Q_CHROMA[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(samp)])
    for cid, ch, cv in samp:
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    out += seg(0xC0, bytes(sof))
    for cls, tid, spec in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        counts, symbols = spec
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(samp)])
    for cid, _, _ in samp:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------------- progressive encode

# flat 8-bit AC table for progressive scans: every (run, size<=10) symbol
# incl. EOBn (size 0) and ZRL — 176 codes of length 8 form a valid
# canonical prefix code; sized for correctness, not compression
_AC_PROG_SYMBOLS = bytes(sorted((r << 4) | s for r in range(16) for s in range(11)))
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0], _AC_PROG_SYMBOLS)


def _p_transform(v: int, al: int) -> int:
    """AC point transform: divide by 2**al rounding toward zero (T.81)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_eobrun(bw, tab, eobrun: int, pending: list[int]) -> None:
    if eobrun:
        r = eobrun.bit_length() - 1
        length, code = tab[r << 4]
        bw.write(code, length)
        if r:
            bw.write(eobrun - (1 << r), r)
    for b in pending:
        bw.write(b, 1)


def _emit_ac_first(bw, tab, blocks, al: int) -> None:
    eobrun = 0
    for zz in blocks:
        vals = [_p_transform(int(zz[k]), al) for k in range(64)]
        last = 0
        for k in range(63, 0, -1):
            if vals[k]:
                last = k
                break
        if last == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(bw, tab, eobrun, [])
                eobrun = 0
            continue
        _emit_eobrun(bw, tab, eobrun, [])
        eobrun = 0
        run = 0
        for k in range(1, last + 1):
            v = vals[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = tab[0xF0]
                bw.write(code, length)
                run -= 16
            s = _category(v)
            length, code = tab[(run << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            eobrun += 1
    _emit_eobrun(bw, tab, eobrun, [])


def _emit_ac_refine(bw, tab, blocks, al: int) -> None:
    """Refinement scan (Ah = al+1, Al = al): newly-significant coefs as
    (run, 1) codes; already-nonzero coefs as correction bits buffered per
    span exactly as the decoder traversal consumes them."""
    eobrun = 0
    pending: list[int] = []
    for zz in blocks:
        vals = [int(zz[k]) for k in range(64)]
        hist = [_p_transform(v, al + 1) for v in vals]
        newly = [k for k in range(1, 64) if hist[k] == 0 and abs(_p_transform(vals[k], al)) == 1]
        if not newly:
            eobrun += 1
            pending += [(abs(vals[k]) >> al) & 1 for k in range(1, 64) if hist[k] != 0]
            if eobrun == 0x7FFF:
                _emit_eobrun(bw, tab, eobrun, pending)
                eobrun, pending = 0, []
            continue
        _emit_eobrun(bw, tab, eobrun, pending)
        eobrun, pending = 0, []
        last_new = newly[-1]
        events: list[tuple[str, int]] = []  # ('b', bit) | ('z', 0)
        run = 0
        for k in range(1, last_new + 1):
            v = vals[k]
            if hist[k] != 0:
                events.append(("b", (abs(v) >> al) & 1))
            elif k in newly:
                while run > 15:
                    length, code = tab[0xF0]
                    bw.write(code, length)
                    zeros = 0
                    while zeros < 16:
                        typ, bit = events.pop(0)
                        if typ == "b":
                            bw.write(bit, 1)
                        else:
                            zeros += 1
                    run -= 16
                length, code = tab[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if v > 0 else 0, 1)
                for typ, bit in events:
                    if typ == "b":
                        bw.write(bit, 1)
                events = []
                run = 0
            else:
                events.append(("z", 0))
                run += 1
        tail = [(abs(vals[k]) >> al) & 1 for k in range(last_new + 1, 64) if hist[k] != 0]
        if last_new < 63:
            eobrun += 1
            pending += tail
    _emit_eobrun(bw, tab, eobrun, pending)


def encode_jpeg_progressive(
    px: np.ndarray, subsample: bool = False, grayscale: bool = False
) -> bytes:
    """(H, W, 3) uint8 RGB -> progressive (SOF2) JFIF bytes.

    Standard 4-phase script exercising every scan type the decoder
    implements: interleaved DC first (Al=1), DC refinement, per-component
    AC first (Ss=1..63, Al=1) with EOB-run accumulation, per-component AC
    refinement (Ah=1, Al=0) with buffered correction bits."""
    h, w, samp, zz_blocks, mcus_x, mcus_y = _prep_quant(px, subsample, grayscale)
    hmax = max(s[1] for s in samp)
    vmax = max(s[2] for s in samp)
    dc_tabs = {1: _encode_table(_DC_LUMA), 2: _encode_table(_DC_CHROMA), 3: _encode_table(_DC_CHROMA)}
    ac_tab = _encode_table(_AC_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    def mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, ch, cv in samp:
                    zz, nbx = zz_blocks[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            yield cid, zz[(my * cv + by) * nbx + (mx * ch + bx)]

    def comp_blocks(cid, ch, cv):
        # the component's REAL (non-MCU-padded) block grid — what
        # non-interleaved progressive scans iterate (T.81 A.2.2)
        zz, nbx = zz_blocks[cid]
        comp_h = -(-(h * cv) // vmax)
        comp_w = -(-(w * ch) // hmax)
        rows, cols = -(-comp_h // 8), -(-comp_w // 8)
        for r in range(rows):
            for c in range(cols):
                yield zz[r * nbx + c]

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(_Q_LUMA[ZIGZAG].astype(np.uint8)))
    if not grayscale:
        out += seg(0xDB, bytes([0x01]) + bytes(_Q_CHROMA[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(samp)])
    for cid, ch, cv in samp:
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    out += seg(0xC2, bytes(sof))
    for cls, tid, spec in ((0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_PROG)):
        if grayscale and tid == 1:
            continue
        counts, symbols = spec
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + symbols)

    al = 1
    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    pred = {cid: 0 for cid, _, _ in samp}
    for cid, zz in mcu_blocks():
        dcv = int(zz[0]) >> al  # arithmetic shift per T.81 DC point transform
        diff = dcv - pred[cid]
        pred[cid] = dcv
        s = _category(diff)
        length, code = dc_tabs[cid][s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += sos([(cid, 0 if cid == 1 else 1, 0) for cid, _, _ in samp], 0, 0, 0, al)
    out += bw.out

    # scan 2: DC refinement, Al=0
    bw = _BitWriter()
    for _cid, zz in mcu_blocks():
        bw.write(int(zz[0]) & 1, 1)
    bw.flush()
    out += sos([(cid, 0 if cid == 1 else 1, 0) for cid, _, _ in samp], 0, 0, al, 0)
    out += bw.out

    # per-component AC scans: first (Al=1) then refinement (Ah=1, Al=0)
    for emitter, ah_al in ((_emit_ac_first, (0, al)), (_emit_ac_refine, (al, 0))):
        for cid, ch, cv in samp:
            bw = _BitWriter()
            emitter(bw, ac_tab, list(comp_blocks(cid, ch, cv)), ah_al[1] if emitter is _emit_ac_first else 0)
            bw.flush()
            out += sos([(cid, 0, 0)], 1, 63, ah_al[0], ah_al[1])
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
