"""GIF codec: round-trips through the fixture encoder (real LZW), the
interlace path, width-growth and 4096-table-reset stress, and dispatch
through decode_image."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.gif import decode_gif, encode_gif
from morphik_core_spark.functions.image import decode_image


def _img(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return pal[idx]


def test_round_trip_small():
    px = _img(13, 17, 5, 0)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_round_trip_interlaced():
    px = _img(23, 9, 7, 1)
    data = encode_gif(px, interlace=True)
    assert np.array_equal(decode_gif(data), px)


def test_width_growth_and_table_reset():
    # 128x128 noise with 256 colors: the LZW table fills past 4095 and
    # the clear/reset path must round-trip exactly
    px = _img(128, 128, 256, 2)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_single_color_image():
    px = np.full((6, 8, 3), 200, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_decode_image_dispatches_gif():
    px = _img(10, 10, 4, 3)
    out = decode_image(encode_gif(px))
    assert out.shape == (10, 10, 3)
    assert np.array_equal(out, px)


def test_non_gif_still_rejected():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 40)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    n_colors=st.integers(1, 256),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_round_trip_property(h, w, n_colors, seed, interlace):
    px = _img(h, w, n_colors, seed)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)
