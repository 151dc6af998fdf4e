"""MJPEG-AVI container codec + the real video frame-sampling operator."""

from __future__ import annotations

import numpy as np
import pytest

from morphik_core_spark.functions.video import encode_avi_mjpeg, parse_avi_mjpeg


def _frames(n: int, h: int = 24, w: int = 32) -> list[np.ndarray]:
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        gray = ((xx * (i + 1) + yy) % 256).astype(np.uint8)
        out.append(gray[..., None].repeat(3, -1).copy())
    return out


def test_avi_roundtrip_preserves_frames_and_rate():
    frames = _frames(12)
    fps, w, h, jpegs = parse_avi_mjpeg(encode_avi_mjpeg(frames, fps=6.0))
    assert (w, h, len(jpegs)) == (32, 24, 12)
    assert fps == pytest.approx(6.0, abs=1e-3)  # usec-per-frame quantization
    from morphik_core_spark.functions.jpeg import decode_jpeg

    px = decode_jpeg(jpegs[3])
    assert px.shape == (24, 32, 3)
    assert np.abs(px.astype(int) - frames[3].astype(int)).mean() < 4.0


def test_avi_rejects_non_avi_and_foreign_codecs():
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_mjpeg(b"\x00\x01\x02\x03 not a container")
    avi = bytearray(encode_avi_mjpeg(_frames(2), fps=4.0))
    strh = bytes(avi).find(b"vids") + 4
    avi[strh : strh + 4] = b"H264"
    with pytest.raises(ValueError, match="H264"):
        parse_avi_mjpeg(bytes(avi))


def test_video_frame_features_samples_and_isolates(spark):
    from morphik_core_spark.operators.multimodal import extract_video_frame_features

    good = encode_avi_mjpeg(_frames(12), fps=6.0)
    # corrupt ONLY frame 0's JPEG (SOF0 -> SOF2) — frame 6 must still decode
    broken = bytearray(good)
    sof = bytes(broken).find(b"\xff\xc0", bytes(broken).find(b"00dc"))
    broken[sof + 1] = 0xC2
    df = spark.createDataFrame(
        [
            ("v1", bytearray(good)),
            ("v2", bytearray(b"GIF89a definitely not video")),
            ("v3", bytes(broken)),
        ],
        "media_id string, payload binary",
    )
    rows = extract_video_frame_features(df, frame_sample_rate=1.0).collect()
    by_id: dict[str, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)

    v1 = sorted(by_id["v1"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in v1] == [0, 6]  # 6 fps sampled at 1 fps
    assert all(r.ok for r in v1)
    assert v1[0].frame_ts == pytest.approx(0.0) and v1[1].frame_ts == pytest.approx(1.0, abs=1e-3)
    assert (v1[0].width, v1[0].height) == (32, 24) and not v1[0].is_blank

    assert len(by_id["v2"]) == 1 and not by_id["v2"][0].ok
    assert "RIFF" in by_id["v2"][0].err

    v3 = sorted(by_id["v3"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in v3] == [0, 6]
    assert not v3[0].ok and "progressive" in v3[0].err  # frame-level isolation
    assert v3[1].ok


def test_dib_avi_roundtrip_exact():
    import numpy as np

    from morphik_core_spark.functions.video import (
        decode_dib_frame,
        encode_avi_dib,
        parse_avi,
    )

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(15, 21, 3), dtype=np.uint8) for _ in range(4)]
    fps, w, h, payloads, codec = parse_avi(encode_avi_dib(frames, fps=8.0))
    assert (fps, w, h, codec) == (8.0, 21, 15, "DIB")
    # lossless: every frame decodes bit-identically
    for orig, p in zip(frames, payloads):
        assert np.array_equal(decode_dib_frame(p, w, h), orig)


def test_dib_frame_features_match_source(spark):
    import numpy as np

    from morphik_core_spark.functions.video import encode_avi_dib
    from morphik_core_spark.operators.multimodal import extract_video_frame_features

    rng = np.random.default_rng(12)
    frames = [np.full((16, 16, 3), (i * 40) % 256, dtype=np.uint8) for i in range(3)]
    blob = encode_avi_dib(frames, fps=1.0)
    df = spark.createDataFrame([("v1", bytearray(blob))], "media_id string, payload binary")
    rows = {r.frame_idx: r for r in extract_video_frame_features(df, frame_sample_rate=1.0).collect()}
    assert len(rows) == 3 and all(r.ok for r in rows.values())
    # DIB is lossless: channel means are exactly the fill values
    for i in range(3):
        assert rows[i].mean_r == float((i * 40) % 256)


def test_dib_short_frame_fails_its_row_only():
    import numpy as np

    from morphik_core_spark.functions.video import decode_dib_frame

    # a frame shorter than stride*height must raise (row-level isolation
    # upstream), never read out of bounds or allocate from bad geometry
    with pytest.raises(ValueError):
        decode_dib_frame(b"\x00" * 10, 8, 8)
    with pytest.raises(ValueError):
        decode_dib_frame(b"\x00" * 1024, 0, 8)
    ok = decode_dib_frame(b"\x00" * (8 * 3 * 8), 8, 8)
    assert ok.shape == (8, 8, 3)
