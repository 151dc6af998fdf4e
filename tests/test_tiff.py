"""Baseline TIFF codec: round-trips across compressions, endians, strip
layouts, and the horizontal predictor; gray and palette photometrics from
hand-built files; dispatch through decode_image."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.image import decode_image
from morphik_core_spark.functions.tiff import decode_tiff, encode_tiff


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_round_trip_compressions_and_endians(comp, big_endian):
    px = _img(9, 14, 1)
    data = encode_tiff(px, compression=comp, big_endian=big_endian)
    assert np.array_equal(decode_tiff(data), px)


def test_multi_strip_and_predictor():
    px = _img(25, 7, 2)
    data = encode_tiff(px, compression=5, rows_per_strip=4, predictor=2)
    assert np.array_equal(decode_tiff(data), px)


def test_lzw_table_reset_stress():
    px = _img(120, 120, 3)  # noise: LZW table fills and resets
    assert np.array_equal(decode_tiff(encode_tiff(px, compression=5)), px)


def _minimal_gray(photo: int) -> tuple[bytes, np.ndarray]:
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    entries = [
        (256, 4, [4]), (257, 4, [3]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [photo]), (273, 4, [0]), (277, 3, [1]), (278, 4, [3]),
        (279, 4, [12]),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        if tag == 273:
            vals = [data_off]
        fmt = {3: "H", 4: "I"}[typ]
        b = struct.pack("<" + fmt * len(vals), *vals).ljust(4, b"\x00")
        out += struct.pack("<HHI", tag, typ, len(vals)) + b
    out += struct.pack("<I", 0)
    out += g.tobytes()
    expected = g if photo == 1 else 255 - g
    return bytes(out), np.repeat(expected[:, :, None], 3, axis=2)


@pytest.mark.parametrize("photo", [0, 1])
def test_grayscale_photometrics(photo):
    data, expected = _minimal_gray(photo)
    assert np.array_equal(decode_tiff(data), expected)


def test_decode_image_dispatches_tiff():
    px = _img(6, 6, 4)
    out = decode_image(encode_tiff(px, compression=32773))
    assert np.array_equal(out, px)


def test_unsupported_compression_raises():
    data = bytearray(encode_tiff(_img(4, 4, 5)))
    # patch the compression tag value to 7 (JPEG-in-TIFF, unsupported)
    i = data.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    data[i + 8 : i + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(data))


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 10_000),
    comp=st.sampled_from([1, 5, 32773]),
    big_endian=st.booleans(),
    rps=st.integers(1, 25),
    predictor=st.sampled_from([1, 2]),
)
def test_round_trip_property(h, w, seed, comp, big_endian, rps, predictor):
    px = _img(h, w, seed)
    data = encode_tiff(
        px, compression=comp, big_endian=big_endian,
        rows_per_strip=min(rps, h), predictor=predictor,
    )
    assert np.array_equal(decode_tiff(data), px)


@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_tiled_layout_round_trips(comp):
    px = _img(37, 53, 6)  # non-multiple of tile size exercises edge tiles
    data = encode_tiff(px, compression=comp, tile=(16, 16))
    assert np.array_equal(decode_tiff(data), px)


@pytest.mark.parametrize("big_endian", [False, True])
def test_16bit_samples_downshift(big_endian):
    px = _img(9, 11, 7)
    data = encode_tiff(px, bits=16, big_endian=big_endian)
    assert np.array_equal(decode_tiff(data), px)


def test_tiled_16bit_lzw():
    px = _img(20, 30, 8)
    data = encode_tiff(px, compression=5, tile=(16, 8), bits=16)
    assert np.array_equal(decode_tiff(data), px)
