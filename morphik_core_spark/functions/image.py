"""Pure-Python/numpy image kernels: PNG/BMP decode (GIF/TIFF/JPEG route to their codec modules), resize, blank detect.

The reference uses PIL for page-image handling
(/root/reference/core/services/ingestion_service.py:1365-1566): resize to
max width 256, and blank-page detection as grayscale extrema range <= 2
(_is_blank_image, :1396-1403). PIL is not in this container, so the two
formats the reference's own pipeline emits/needs most — PNG (its PDF page
renders are PNG) and BMP — are decoded for real with stdlib zlib + numpy:

- PNG: 8- and 16-bit depth (high-byte downshift), Adam7 interlace,
  color types 0 (gray), 2 (RGB), 3 (palette), 4/6 (alpha composited
  over white), all five scanline filters, multi-IDAT.
- BMP: uncompressed BITMAPINFOHEADER 24/32 bpp, bottom-up or top-down.

JPEG (baseline AND progressive) decodes for real via ``functions/jpeg``;
GIF via ``functions/gif``; baseline TIFF via ``functions/tiff`` — all
dispatched from :func:`decode_image`. ``encode_png`` exists
so tests and the page-render pipeline can round-trip without PIL. Resize
is nearest-neighbor (deterministic, vectorized); PIL's default bicubic is
a documented deviation.
"""

from __future__ import annotations

import struct
import zlib

# corrupt-header allocation cap (see tiff.py: fail, never memset GBs)
_MAX_PIXELS = 1 << 26

import numpy as np

__all__ = [
    "decode_image",
    "decode_png",
    "decode_bmp",
    "encode_png",
    "resize_max_side",
    "to_grayscale",
    "is_blank_image",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode → (H, W, 3) uint8 RGB. Raises ValueError on formats
    these kernels don't cover (arithmetic JPEG, WebP/AVIF, exotic TIFF
    photometrics, ...) so callers isolate the row."""
    if data is None or len(data) < 8:
        raise ValueError("empty or truncated image payload")
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from morphik_core_spark.functions.gif import decode_gif

        return decode_gif(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from morphik_core_spark.functions.tiff import decode_tiff

        return decode_tiff(data)
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from morphik_core_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unsupported image format (PNG, BMP, GIF, baseline TIFF/JPEG only)")


# ------------------------------------------------------------------ PNG


def _png_chunks(data: bytes):
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        yield ctype, data[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + crc
        if ctype == b"IEND":
            break


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters; returns (height, stride) uint8."""
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    v = line[x] + a
                elif ftype == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


# Adam7 interlace pass grid: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(data: bytes) -> np.ndarray:
    width = height = None
    bit_depth = color_type = None
    interlace = 0
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth not in (8, 16):
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a thing")
    sample_bytes = bit_depth // 8
    bpp = channels * sample_bytes
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise ValueError(f"PNG dimensions out of range ({width}x{height})")
    # bound the inflate output by what the declared geometry can need —
    # a corrupt IDAT must not deflate-bomb gigabytes in one C call
    max_raw = (height + 8) * (width * bpp + 8)
    d = zlib.decompressobj()
    raw = np.frombuffer(d.decompress(bytes(idat), max_raw), dtype=np.uint8)
    if d.unconsumed_tail:
        raise ValueError("PNG IDAT larger than declared geometry")
    # decompressobj returns PARTIAL bytes for a truncated stream (unlike
    # zlib.decompress, which raised) — check the exact expected raw size
    # now so truncation surfaces as a diagnosable error here, not as a
    # numpy reshape/broadcast error deep in _unfilter. Trailing non-zlib
    # garbage after the deflate stream is likewise corruption, not slack.
    if interlace == 1:
        expected_raw = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw and ph:
                expected_raw += ph * (1 + pw * bpp)
    else:
        expected_raw = height * (1 + width * bpp)
    if len(raw) != expected_raw:
        raise ValueError(
            f"PNG IDAT truncated or corrupt: inflated {len(raw)} raw bytes, "
            f"geometry {width}x{height}x{bpp}bpp needs {expected_raw}"
        )
    if d.unused_data.strip(b"\x00"):
        raise ValueError("trailing garbage after PNG deflate stream")

    def to_samples(byte_img: np.ndarray, h: int, w: int) -> np.ndarray:
        if sample_bytes == 1:
            return byte_img.reshape(h, w, channels)
        # 16-bit is big-endian: the high byte is the PIL-style 8-bit value
        return byte_img.reshape(h, w, channels, 2)[..., 0]

    if interlace == 0:
        px = to_samples(_unfilter(raw, height, width * bpp, bpp), height, width)
    elif interlace == 1:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = pw * bpp
            sub_raw = raw[pos : pos + ph * (1 + stride)]
            pos += ph * (1 + stride)
            sub = to_samples(_unfilter(sub_raw, ph, stride, bpp), ph, pw)
            px[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ValueError("interlaced PNG data length mismatch")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[px[..., 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    # alpha types: composite over white, like page renders expect
    rgb = px[..., :-1] if color_type == 6 else np.repeat(px[..., :1], 3, axis=2)
    alpha = px[..., -1:].astype(np.float32) / 255.0
    return (rgb.astype(np.float32) * alpha + 255.0 * (1.0 - alpha)).round().astype(np.uint8)


def encode_png(
    px: np.ndarray, filter_type: int = 0, interlace: bool = False, bits: int = 8
) -> bytes:
    """(H, W, 3) uint8 → PNG (one IDAT) — fixture/round-trip aid. Any of
    the five scanline filters can be requested; ``interlace=True`` emits
    Adam7 (each pass independently filtered); ``bits=16`` writes the
    samples into the high byte so the decoder's downshift round-trips."""
    h, w, _ = px.shape
    bpp = 3 * (bits // 8)

    def sample_bytes(img: np.ndarray) -> np.ndarray:
        if bits == 8:
            return img.reshape(img.shape[0], -1).astype(np.int32)
        # big-endian 16-bit: high byte = value, low byte = 0
        wide = np.zeros(img.shape[:2] + (3, 2), dtype=np.uint8)
        wide[..., 0] = img
        return wide.reshape(img.shape[0], -1).astype(np.int32)

    def filtered(img: np.ndarray) -> bytes:
        rows = sample_bytes(img)
        stride = rows.shape[1]
        lines = []
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(rows.shape[0]):
            cur = rows[y]
            if filter_type == 0:
                enc = cur
            elif filter_type == 1:
                left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
                enc = (cur - left) & 0xFF
            elif filter_type == 2:
                enc = (cur - prev) & 0xFF
            elif filter_type == 3:
                left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            elif filter_type == 4:
                left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
                upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
                enc = (cur - pred) & 0xFF
            else:
                raise ValueError(f"unknown filter {filter_type}")
            lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
            prev = cur
        return b"".join(lines)

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filtered(sub))
        body = b"".join(parts)
    else:
        body = filtered(px)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bits, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP


def decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54:
        raise ValueError("truncated BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    nbytes = bpp // 8
    row_size = (width * nbytes + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=row_size * height, offset=offset)
    px = px.reshape(height, row_size)[:, : width * nbytes].reshape(height, width, nbytes)
    if bottom_up:
        px = px[::-1]
    return px[..., [2, 1, 0]].copy()  # BGR(A) → RGB, alpha dropped


# ------------------------------------------------------------ operations


def resize_max_side(px: np.ndarray, max_side: int = 256) -> np.ndarray:
    """Proportional nearest-neighbor downscale so max(H, W) <= max_side
    (the reference caps page images at width 256, ingestion_service.py:1495).
    Never upscales."""
    h, w = px.shape[:2]
    scale = max(h, w) / max_side
    if scale <= 1.0:
        return px
    nh, nw = max(1, int(round(h / scale))), max(1, int(round(w / scale)))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return px[ys][:, xs]


def to_grayscale(px: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, PIL 'L'-convert coefficients (truncating like PIL)."""
    f = px.astype(np.float32)
    return (f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114).astype(np.uint8)


def is_blank_image(px: np.ndarray, tolerance: int = 2) -> bool:
    """Reference blank-page rule (_is_blank_image): grayscale extrema range
    <= tolerance."""
    g = to_grayscale(px)
    return int(g.max()) - int(g.min()) <= tolerance
