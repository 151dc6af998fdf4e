"""Baseline JPEG codec: round-trips across sampling/restart modes, marker
handling, and the e2e path through the multimodal image-feature operator."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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


def test_mislabeled_progressive_and_garbage_raise():
    # a baseline stream relabeled SOF2 is structurally invalid progressive
    # (its single scan has Se=63 with Ss=0, illegal for a DC scan)
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
    corrupt row still fails row-level without touching its neighbors."""
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
    assert not rows["j2"].ok and "progressive" in rows["j2"].err  # invalid scan header
    assert rows["j3"].ok and rows["j3"].is_blank


# ------------------------------------------------------------- progressive


def test_progressive_round_trip_matches_baseline():
    from morphik_core_spark.functions.jpeg import encode_jpeg_progressive

    out = decode_jpeg(encode_jpeg_progressive(IMG))
    ref = decode_jpeg(encode_jpeg_baseline(IMG))
    assert np.array_equal(out, ref)


def test_progressive_subsampled_and_grayscale():
    from morphik_core_spark.functions.jpeg import encode_jpeg_progressive

    for kw in ({"subsample": True}, {"grayscale": True}):
        out = decode_jpeg(encode_jpeg_progressive(IMG, **kw))
        ref = decode_jpeg(encode_jpeg_baseline(IMG, **kw))
        assert np.array_equal(out, ref), kw


def test_progressive_eob_run_and_refine_stress():
    """Dense noise maximizes newly-significant/refine traffic; flat areas
    maximize EOB runs — both paths must round-trip exactly."""
    from morphik_core_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    img = np.zeros((48, 80, 3), dtype=np.uint8)
    img[:24] = rng.integers(0, 256, size=(24, 80, 3), dtype=np.uint8)  # noise
    img[24:] = 130  # flat -> long EOB runs
    out = decode_jpeg(encode_jpeg_progressive(img))
    ref = decode_jpeg(encode_jpeg_baseline(img))
    assert np.array_equal(out, ref)


def test_progressive_through_decode_image_and_features(spark):
    from morphik_core_spark.functions.image import decode_image
    from morphik_core_spark.functions.jpeg import encode_jpeg_progressive
    from morphik_core_spark.operators.multimodal import extract_image_features

    data = encode_jpeg_progressive(IMG, subsample=True)
    assert decode_image(data).shape == IMG.shape
    df = spark.createDataFrame([("p1", bytearray(data))], "media_id string, payload binary")
    [row] = extract_image_features(df).collect()
    assert row.ok and row.width == IMG.shape[1] and row.height == IMG.shape[0]


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 10_000),
    mode=st.sampled_from(["color", "gray", "420"]),
)
def test_progressive_property_round_trip(h, w, seed, mode):
    from morphik_core_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    kw = {"grayscale": mode == "gray", "subsample": mode == "420"}
    out = decode_jpeg(encode_jpeg_progressive(img, **kw))
    ref = decode_jpeg(encode_jpeg_baseline(img, **kw))
    assert np.array_equal(out, ref)
