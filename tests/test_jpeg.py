"""Baseline JPEG codec: round-trips across sampling/restart modes, marker
handling, and the e2e path through the multimodal image-feature operator."""

from __future__ import annotations

import numpy as np
import pytest

from morphik_core_spark.functions.image import decode_image
from morphik_core_spark.functions.jpeg import decode_jpeg, encode_jpeg_baseline


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(h + w - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


IMG = _gradient(37, 53)  # deliberately not a multiple of 8 or 16


def test_roundtrip_444_is_close():
    out = decode_jpeg(encode_jpeg_baseline(IMG))
    assert out.shape == IMG.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - IMG.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12


def test_roundtrip_420_subsampled_is_close():
    out = decode_jpeg(encode_jpeg_baseline(IMG, subsample=True))
    assert out.shape == IMG.shape
    err = np.abs(out.astype(int) - IMG.astype(int))
    assert err.mean() < 5.0  # chroma smoothing is expected, luma carries detail


def test_restart_markers_resync_exactly():
    """RST segmentation changes the byte stream but not the decoded pixels."""
    plain = decode_jpeg(encode_jpeg_baseline(IMG))
    with_rst = decode_jpeg(encode_jpeg_baseline(IMG, restart_interval=2))
    assert np.array_equal(plain, with_rst)
    sub_plain = decode_jpeg(encode_jpeg_baseline(IMG, subsample=True))
    sub_rst = decode_jpeg(encode_jpeg_baseline(IMG, subsample=True, restart_interval=3))
    assert np.array_equal(sub_plain, sub_rst)


def test_uniform_image_is_exact():
    flat = np.full((16, 24, 3), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_baseline(flat)), flat)


def test_grayscale_single_component():
    gray = np.repeat(_gradient(17, 19)[..., :1], 3, axis=2)  # r=g=b
    out = decode_jpeg(encode_jpeg_baseline(gray, grayscale=True))
    assert out.shape == gray.shape
    # single-component decode replicates luma into all three channels
    assert np.array_equal(out[..., 0], out[..., 1]) and np.array_equal(out[..., 1], out[..., 2])
    err = np.abs(out[..., 0].astype(int) - gray[..., 0].astype(int))
    assert err.mean() < 3.0


def test_progressive_and_garbage_raise():
    data = bytearray(encode_jpeg_baseline(IMG))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0JFIF...")  # truncated junk
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_decode_image_sniffs_jpeg():
    out = decode_image(encode_jpeg_baseline(IMG))
    assert out.shape == IMG.shape


def test_image_features_e2e_with_jpeg_rows(spark):
    """JPEG payloads now flow through the multimodal feature kernel; a
    progressive row still fails row-level without touching its neighbors."""
    from morphik_core_spark.operators.multimodal import extract_image_features

    good = encode_jpeg_baseline(_gradient(40, 64), subsample=True)
    bad = bytearray(good)
    bad[bytes(bad).find(b"\xff\xc0") + 1] = 0xC2
    blank = encode_jpeg_baseline(np.full((20, 20, 3), 255, np.uint8))
    df = spark.createDataFrame(
        [("j1", bytearray(good)), ("j2", bytes(bad)), ("j3", bytearray(blank))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in extract_image_features(df).collect()}
    assert rows["j1"].ok and rows["j1"].width == 64 and rows["j1"].height == 40
    assert not rows["j1"].is_blank
    assert not rows["j2"].ok and "progressive" in rows["j2"].err
    assert rows["j3"].ok and rows["j3"].is_blank
