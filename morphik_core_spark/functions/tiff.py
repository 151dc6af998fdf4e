"""Pure-Python/numpy baseline TIFF codec: uncompressed, PackBits, and
TIFF-LZW (MSB-first, early-change) strips; gray/RGB/palette photometrics;
horizontal predictor; strip AND tile layouts; 8/16-bit samples
(PIL-style high-byte downshift); II and MM byte orders; first IFD only.

With GIF done this closes the last common still-image gap except
progressive JPEG (reference ingests arbitrary images via PIL —
`core/services/ingestion_service.py:1365-1448`). Exotic photometrics (CMYK, YCbCr-in-TIFF) raise row-level like every
other unsupported vintage.

TIFF LZW is NOT GIF LZW: codes pack MSB-first, the clear code is 256
over byte-wide roots, and the code width grows one code EARLY (at table
length 2**width - 1, the spec's 510/1022/2046 switch points) — both
sides here implement that variant and the fixture encoder is
hypothesis-round-tripped against the decoder."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# decode cap: corrupt headers must raise, never allocate unbounded
# buffers (a flipped dimension bit otherwise memsets gigabytes inside a
# single numpy call, unkillable row-side). 2^26 px = 8192x8192.
_MAX_PIXELS = 1 << 26


def _read_ifd(data: bytes, e: str):
    off = struct.unpack_from(e + "I", data, 4)[0]
    n = struct.unpack_from(e + "H", data, off)[0]
    tags = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        # cnt is a raw u32: a corrupt value can't need more bytes than the
        # file holds — reject before "H"*cnt builds a gigabyte format
        # string (the unkillable-allocation class _MAX_PIXELS guards too)
        if cnt > len(data) // size:
            raise ValueError(f"TIFF tag {tag} count {cnt} exceeds file size")
        total = size * cnt
        if total <= 4:
            raw = data[base + 8 : base + 8 + total]
        else:
            p = struct.unpack_from(e + "I", data, base + 8)[0]
            raw = data[p : p + total]
        if len(raw) < total:
            raise ValueError(f"TIFF tag {tag} data truncated")
        if typ == 3:
            vals = list(struct.unpack(e + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(e + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            continue
        tags[tag] = vals
    return tags


def _packbits_decode(blob: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(blob) and len(out) < expected:
        n = blob[i]
        i += 1
        if n < 128:
            out += blob[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += blob[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits strip truncated")
    return bytes(out[:expected])


def _lzw_decode_tiff(blob: bytes, expected: int | None) -> bytes:
    """TIFF/PDF-variant LZW (MSB-first, early change). ``expected=None``
    decodes until EOI/end-of-data (the PDF stream case, which carries no
    decoded-length hint)."""
    clear, eoi = 256, 257
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))  # MSB-first
    out = bytearray()
    pos = 0
    width = 9
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: bytes | None = None
    weights9 = {w: (1 << np.arange(w - 1, -1, -1, dtype=np.int64)) for w in (9, 10, 11, 12)}
    total = len(bits)
    while (expected is None or len(out) < expected) and pos + width <= total:
        code = int(bits[pos : pos + width] @ weights9[width])
        pos += width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # EARLY change: widen one entry before the table is actually full
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if expected is None:
        return bytes(out)
    if len(out) < expected:
        raise ValueError("TIFF pixel data truncated")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD as (H, W, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(data, e)
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"TIFF dimensions out of range ({w}x{h})")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bps = tags.get(_TAG_BPS, [8])
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if any(b not in (8, 16) for b in bps) or len(set(bps)) != 1:
        raise ValueError(f"unsupported TIFF bits-per-sample {bps}")
    sample_bytes = bps[0] // 8
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with <3 samples")
    if photo == 3 and sample_bytes != 1:
        raise ValueError("16-bit palette TIFF unsupported")

    def decode_blob(blob: bytes, expected: int) -> bytes:
        if comp == 1:
            if len(blob) < expected:
                raise ValueError("TIFF strip truncated")
            return blob[:expected]
        if comp == 32773:
            return _packbits_decode(blob, expected)
        if comp == 5:
            return _lzw_decode_tiff(blob, expected)
        raise ValueError(f"unsupported TIFF compression {comp}")

    if _TAG_TILE_OFFSETS in tags:  # tiled layout
        tw = tags[_TAG_TILE_WIDTH][0]
        tl = tags[_TAG_TILE_LENGTH][0]
        offsets = tags[_TAG_TILE_OFFSETS]
        counts = tags[_TAG_TILE_COUNTS]
        if tw <= 0 or tl <= 0:
            raise ValueError("TIFF tile size out of range")
        tiles_x = -(-w // tw)
        tiles_y = -(-h // tl)
        if len(offsets) != tiles_x * tiles_y:
            raise ValueError("TIFF tile count mismatch")
        if tiles_x * tw * tiles_y * tl > 4 * _MAX_PIXELS:
            # padded tile grid from a corrupt header must FAIL, not
            # allocate gigabytes (fail-fast contract of the parse UDFs)
            raise ValueError("TIFF padded tile grid out of range")
        dt = np.uint8 if sample_bytes == 1 else (e + "u2")
        full = np.zeros((tiles_y * tl, tiles_x * tw, spp), dtype=np.uint16 if sample_bytes == 2 else np.uint8)
        expected = tw * tl * spp * sample_bytes
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            blob = decode_blob(data[o : o + c], expected)
            tile = np.frombuffer(blob, dtype=dt).reshape(tl, tw, spp)
            ty, tx = divmod(ti, tiles_x)
            full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
        px = full[:h, :w]
    else:
        try:
            offsets = tags[_TAG_STRIP_OFFSETS]
            counts = tags[_TAG_STRIP_COUNTS]
        except KeyError as exc:
            raise ValueError(f"TIFF missing required tag {exc}") from exc
        rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
        row_bytes = w * spp * sample_bytes
        raw = bytearray()
        for i, (o, c) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, h - i * rows_per_strip)
            raw += decode_blob(data[o : o + c], nrows * row_bytes)
        dt = np.uint8 if sample_bytes == 1 else (e + "u2")
        px = np.frombuffer(bytes(raw), dtype=dt).reshape(h, w, spp)
    if sample_bytes == 2:
        if predictor == 2:
            px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint16)
        px = (px >> 8).astype(np.uint8)  # PIL-style downshift to 8-bit
        predictor = 1
    if predictor == 2:
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photo == 2:
        return np.ascontiguousarray(px[:, :, :3])
    if photo == 3:
        cmap = tags.get(_TAG_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        # TIFF colormaps are 16-bit; PIL-style downshift to 8-bit
        cm = (np.asarray(cmap, dtype=np.uint32).reshape(3, n).T >> 8).astype(np.uint8)
        return cm[px[:, :, 0]]
    g = px[:, :, 0]
    if photo == 0:  # WhiteIsZero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


def _packbits_encode(row: bytes) -> bytes:
    # literal-only PackBits (valid, not maximally compressed) with real
    # run encoding for repeats of >=3 — enough to exercise both branches
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i + 1
            while j < n and (j - i) < 128:
                nxt = 1
                while j + nxt < n and nxt < 3 and row[j + nxt] == row[j]:
                    nxt += 1
                if nxt >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def _lzw_encode_tiff(payload: bytes) -> bytes:
    clear, eoi = 256, 257
    out_bits: list[tuple[int, int]] = []
    width = 9
    table: dict[bytes, int] = {}
    next_code = 258
    dec_len = 258
    since_clear = 0

    def reset():
        nonlocal width, table, next_code, dec_len, since_clear
        width = 9
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        dec_len = 258
        since_clear = 0

    def emit(code: int):
        nonlocal dec_len, width, since_clear
        out_bits.append((code, width))
        since_clear += 1
        if since_clear >= 2:
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < 12:  # early change
                width += 1

    out_bits.append((clear, 9))
    reset()
    prev = b""
    for v in payload:
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        prev = bytes([v])
        if next_code > 4093:
            out_bits.append((clear, width))
            reset()
    if prev:
        emit(table[prev])
    out_bits.append((eoi, width))

    acc = 0
    nbits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    bits: int = 8,
) -> bytes:
    """(H, W, 3) uint8 RGB → single-IFD TIFF. Fixture/round-trip aid;
    compression 1 (none), 5 (LZW), or 32773 (PackBits); ``tile=(tw,tl)``
    emits a tiled layout instead of strips; ``bits=16`` scales samples
    to the high byte so the decoder's downshift round-trips exactly."""
    e = ">" if big_endian else "<"
    h, w, _ = px.shape
    rps = rows_per_strip or h
    if bits == 8:
        src = px.astype(np.uint8)
        if predictor == 2:
            d = src.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            src = (d % 256).astype(np.uint8)
        def tobytes(a):
            return a.tobytes()
    elif bits == 16:
        if predictor == 2:
            raise ValueError("fixture encoder: predictor only at 8-bit")
        src = (px.astype(np.uint16) << 8).astype(e + "u2")
        def tobytes(a):
            return np.ascontiguousarray(a).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")

    def compress_chunk(chunk: bytes) -> bytes:
        if compression == 1:
            return chunk
        if compression == 32773:
            return _packbits_encode(chunk)
        if compression == 5:
            return _lzw_encode_tiff(chunk)
        raise ValueError(f"unsupported compression {compression}")

    tile_tags = None
    if tile is not None:
        tw, tl = tile
        tiles_x, tiles_y = -(-w // tw), -(-h // tl)
        padded = np.zeros((tiles_y * tl, tiles_x * tw, 3), dtype=src.dtype)
        padded[:h, :w] = src
        strips = []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                strips.append(compress_chunk(tobytes(padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw])))
        tile_tags = (tw, tl)
    else:
        strips = [compress_chunk(tobytes(src[r0 : r0 + rps])) for r0 in range(0, h, rps)]

    header = struct.pack(e + "2sHI", b"II" if not big_endian else b"MM", 42, 8)
    n_strips = len(strips)
    entries = []

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(_TAG_WIDTH, 4, [w])
    entry(_TAG_HEIGHT, 4, [h])
    entry(_TAG_BPS, 3, [bits, bits, bits])
    entry(_TAG_COMPRESSION, 3, [compression])
    entry(_TAG_PHOTOMETRIC, 3, [2])
    entry(_TAG_SPP, 3, [3])
    if tile_tags is not None:
        entry(_TAG_TILE_WIDTH, 4, [tile_tags[0]])
        entry(_TAG_TILE_LENGTH, 4, [tile_tags[1]])
        entry(_TAG_TILE_OFFSETS, 4, [0] * n_strips)  # patched below
        entry(_TAG_TILE_COUNTS, 4, [len(s) for s in strips])
    else:
        entry(_TAG_STRIP_OFFSETS, 4, [0] * n_strips)  # patched below
        entry(_TAG_ROWS_PER_STRIP, 4, [rps])
        entry(_TAG_STRIP_COUNTS, 4, [len(s) for s in strips])
    if predictor != 1:
        entry(_TAG_PREDICTOR, 3, [predictor])
    entries.sort()

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # layout: header, IFD, overflow arrays, strip data
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(e + fmt * len(vals), *vals)

    # first pass to size overflow
    sizes = []
    for tag, typ, vals in entries:
        b = pack_vals(typ, vals)
        sizes.append(len(b))
    fixed_overflow = sum(sz for sz in sizes if sz > 4)
    data_base = overflow_base + fixed_overflow
    offs = []
    acc_off = data_base
    for s in strips:
        offs.append(acc_off)
        acc_off += len(s)

    ifd = bytearray(struct.pack(e + "H", len(entries)))
    for tag, typ, vals in entries:
        if tag in (_TAG_STRIP_OFFSETS, _TAG_TILE_OFFSETS):
            vals = offs
        b = pack_vals(typ, vals)
        if len(b) <= 4:
            ifd += struct.pack(e + "HHI", tag, typ, len(vals)) + b.ljust(4, b"\x00")
        else:
            ifd += struct.pack(e + "HHII", tag, typ, len(vals), overflow_base + len(overflow))
            overflow += b
    ifd += struct.pack(e + "I", 0)  # no next IFD
    return header + bytes(ifd) + bytes(overflow) + b"".join(strips)
