"""Pure-Python image codec: PNG filters/color types, BMP, resize, blank."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from morphik_core_spark.functions.image import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
    is_blank_image,
    resize_max_side,
    to_grayscale,
)

RNG = np.random.default_rng(3)
PX = RNG.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    decoded = decode_png(encode_png(PX, filter_type=filter_type))
    assert np.array_equal(decoded, PX)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _raw_png(width, height, color_type, channels, pixel_bytes, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    body = b"".join(b"\x00" + pixel_bytes[y * width * channels : (y + 1) * width * channels] for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )


def test_png_grayscale_and_palette_and_alpha():
    gray = bytes([0, 100, 255, 30])
    out = decode_png(_raw_png(2, 2, 0, 1, gray))
    assert out.shape == (2, 2, 3) and out[0, 1].tolist() == [100, 100, 100]

    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    out = decode_png(_raw_png(2, 1, 3, 1, bytes([0, 1]), extra=plte))
    assert out[0, 0].tolist() == [255, 0, 0] and out[0, 1].tolist() == [0, 255, 0]

    # RGBA: alpha 0 composites to white, alpha 255 keeps the color
    rgba = bytes([10, 20, 30, 255, 10, 20, 30, 0])
    out = decode_png(_raw_png(2, 1, 6, 4, rgba))
    assert out[0, 0].tolist() == [10, 20, 30] and out[0, 1].tolist() == [255, 255, 255]


def test_bmp_24_and_32():
    # 2x2 24bpp bottom-up: rows padded to 4 bytes (2*3=6 → pad 2)
    row_bottom = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # blue, green (BGR)
    row_top = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red, white
    header = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 0, 0, 0, 0, 0)
    out = decode_bmp(header + info + row_bottom + row_top)
    assert out[0, 0].tolist() == [255, 0, 0]  # top row comes from the last stored row
    assert out[0, 1].tolist() == [255, 255, 255]
    assert out[1, 0].tolist() == [0, 0, 255]  # BGR→RGB swap

    info32 = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 0, 0, 0, 0, 0, 0)  # top-down
    px32 = bytes([1, 2, 3, 77])
    out = decode_bmp(struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54) + info32 + px32)
    assert out[0, 0].tolist() == [3, 2, 1]


def test_decode_image_sniffs_and_rejects():
    assert decode_image(encode_png(PX)).shape == PX.shape
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0JFIF...")  # JPEG
    with pytest.raises(ValueError):
        decode_image(b"")


def test_resize_caps_max_side_and_never_upscales():
    big = np.zeros((100, 640, 3), dtype=np.uint8)
    small = resize_max_side(big, 256)
    assert max(small.shape[:2]) == 256 and small.shape[0] == 40  # 100/2.5
    tiny = np.zeros((10, 20, 3), dtype=np.uint8)
    assert resize_max_side(tiny, 256).shape == tiny.shape


def test_blank_rule_matches_reference_tolerance():
    flat = np.full((4, 4, 3), 128, dtype=np.uint8)
    assert is_blank_image(flat)
    almost = flat.copy()
    almost[0, 0] = 131  # gray delta 3 > tolerance 2
    assert not is_blank_image(almost)
    assert to_grayscale(np.array([[[255, 0, 0]]], dtype=np.uint8))[0, 0] == 76  # .299*255


def test_adam7_interlaced_png_round_trips():
    import numpy as np

    from morphik_core_spark.functions.image import decode_png, encode_png

    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (3, 5), (8, 8), (23, 17)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in (0, 2, 4):
            assert np.array_equal(decode_png(encode_png(px, filter_type=ft, interlace=True)), px), (h, w, ft)


def test_16bit_png_downshifts():
    import numpy as np

    from morphik_core_spark.functions.image import decode_png, encode_png

    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, bits=16)), px)
    assert np.array_equal(decode_png(encode_png(px, bits=16, interlace=True)), px)


def test_truncated_idat_raises_descriptive_error():
    # decompressobj yields PARTIAL output on truncation; the decoder must
    # turn that into a diagnosable error at the decode site, not a numpy
    # shape error from _unfilter (ADVICE, image.py)
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    # find the IDAT chunk and truncate its deflate payload mid-stream,
    # recomputing length + CRC so chunk framing stays valid
    i = data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", data[i : i + 4])
    body = bytes(data[i + 8 : i + 8 + length][: length // 2])
    chunk = struct.pack(">I", len(body)) + b"IDAT" + body + struct.pack(
        ">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF
    )
    rebuilt = bytes(data[:i]) + chunk + bytes(data[i + 12 + length :])
    with pytest.raises(ValueError, match="truncated|needs"):
        decode_png(rebuilt)


def test_trailing_garbage_after_deflate_raises():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    i = data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", data[i : i + 4])
    body = bytes(data[i + 8 : i + 8 + length]) + b"GARBAGE!"
    chunk = struct.pack(">I", len(body)) + b"IDAT" + body + struct.pack(
        ">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF
    )
    rebuilt = bytes(data[:i]) + chunk + bytes(data[i + 12 + length :])
    with pytest.raises(ValueError, match="trailing garbage"):
        decode_png(rebuilt)
