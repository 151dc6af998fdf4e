"""Pure-Python/numpy GIF codec: LZW decode (87a/89a, interlace, local
color tables, transparency-tolerant) plus an LZW encoder for fixtures.

Closes the last common-web-image gap in the multimodal family (reference
ingests arbitrary images via PIL — `core/services/ingestion_service.py:
1365-1448`; here PNG/BMP/baseline-JPEG were already real and GIF was a
per-row parse failure). First frame only for animated files — the frame
feature kernels (`operators/multimodal.py`) sample stills, same as a
PIL ``convert("RGB")`` of an animated GIF.

No external libs: the LZW stream is unpacked with numpy bit tricks and a
plain python table loop (tables are ≤4096 entries; the per-code loop is
over codes, not pixels)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_MAGICS = (b"GIF87a", b"GIF89a")


def _read_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[off]
        off += 1
        if n == 0:
            return bytes(out), off
        out += data[off : off + n]
        off += n


# corrupt-header allocation cap (see tiff.py: fail, never memset GBs)
_MAX_PIXELS = 1 << 26


def _lzw_decode(blob: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    # unpack the whole stream to a bit array once (LSB-first packing)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8), bitorder="little")
    out = np.empty(n_pixels, dtype=np.uint16)
    n_out = 0
    pos = 0
    width = min_code_size + 1

    table: list[bytes] = []

    def reset_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset_table()
    prev: bytes | None = None
    total_bits = len(bits)
    while n_out < n_pixels and pos + width <= total_bits:
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == end:
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
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry, dtype=np.uint8)[:take]
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError("GIF pixel data truncated")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB."""
    if data[:6] not in _MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x21:  # extension: label byte + sub-blocks
            off += 1
            _, off = _read_subblocks(data, off)
        elif block == 0x2C:  # image descriptor -> decode and return
            _lx, _ty, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
            off += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
                off += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
                raise ValueError(f"GIF dimensions out of range ({w}x{h})")
            min_code = data[off]
            off += 1
            blob, off = _read_subblocks(data, off)
            idx = _lzw_decode(blob, min_code, w * h).reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                deinter = np.empty_like(idx)
                rows = np.concatenate(
                    [np.arange(start, h, step) for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                deinter[rows] = idx
                idx = deinter
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index outside color table")
            return ct[idx]
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real dictionary LZW (table reset at 4096), GIF bit packing.

    Width transitions mirror the decoder exactly: the decoder appends one
    table entry per code read AFTER the first since a clear, and widens
    when its table length hits 2**width — so the encoder simulates that
    length rather than trusting its own next_code (the classic
    off-by-one between the two)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    width = min_code_size + 1
    table: dict[bytes, int] = {}
    next_code = 0
    dec_len = 0
    since_clear = 0

    def reset():
        nonlocal width, table, next_code, dec_len, since_clear
        width = min_code_size + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        dec_len = end + 1
        since_clear = 0

    def emit(code: int):
        nonlocal dec_len, width, since_clear
        out_bits.append((code, width))
        since_clear += 1
        if since_clear >= 2:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1

    out_bits.append((clear, min_code_size + 1))
    reset()
    prev = b""
    for v in indices.tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        prev = bytes([v])
        if next_code > 4095:
            # the decoder does NOT append an entry for a clear code, so
            # it bypasses emit()'s decoder-length simulation
            out_bits.append((clear, width))
            reset()
    if prev:
        emit(table[prev])
    out_bits.append((end, width))

    acc = 0
    nbits = 0
    payload = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    return bytes(payload)


def encode_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → single-frame GIF89a.

    Fixture/round-trip aid (like ``image.encode_png``): palette from the
    unique colors, real LZW compression, optional interlace so the
    decoder's 4-pass path is testable libless."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    n_slots = max(2, 1 << int(np.ceil(np.log2(len(colors)))) if len(colors) > 1 else 1)
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    gct_bits = int(np.log2(n_slots))
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = np.concatenate(
            [np.arange(start, h, step) for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        idx = idx[rows]
    min_code = max(2, gct_bits)
    payload = _lzw_encode(idx.reshape(-1), min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)
