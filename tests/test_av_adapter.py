"""ffmpeg-shaped A/V decoder boundary: contract tests with fake runners
(no ffmpeg in this container — the adapter is the declared boundary), and
e2e through the video feature operator showing builtin + external decoders
sharing one row-level-failure pipeline."""

from __future__ import annotations

import json

import numpy as np
import pytest

from morphik_core_spark.functions.av_adapter import (
    AudioMeta,
    ExternalDecoderError,
    VideoMeta,
    builtin_video_decoder,
    ffmpeg_audio_decoder,
    ffmpeg_video_decoder,
)

W, H, FPS, NF = 4, 3, 10.0, 20


def _make_fake_video_runner():
    # nested def so cloudpickle ships it BY VALUE into Spark workers —
    # a module-level test function pickles by reference and fails there
    def fake_video_runner(argv: list[str], stdin: bytes) -> bytes:
        if b"fakeh264" not in stdin:  # a real ffmpeg rejects junk too
            raise RuntimeError("unrecognized input format")
        if argv[0] == "ffprobe":
            return json.dumps(
                {"streams": [{"codec_name": "h264", "width": 4, "height": 3,
                              "avg_frame_rate": "10/1", "nb_frames": "20"}]}
            ).encode()
        assert argv[0] == "ffmpeg" and "rawvideo" in argv
        # fps=2 sampling of a 10fps 20-frame video -> 4 frames; frame k is
        # solid value 10*k so assertions can see which frames arrived
        rate = float(dict(zip(argv, argv[1:]))["-vf"].split("=")[1])
        n = int(20 / 10.0 * rate)
        return b"".join(bytes([10 * k]) * (4 * 3 * 3) for k in range(n))

    return fake_video_runner


_fake_video_runner = _make_fake_video_runner()


def test_ffmpeg_video_decoder_contract():
    decode = ffmpeg_video_decoder(_fake_video_runner)
    meta, frames = decode(b"\x00fakeh264", 2.0)
    assert meta == VideoMeta(codec="h264", width=W, height=H, fps=FPS, n_frames=NF)
    out = list(frames)
    assert len(out) == 4
    # sampled at 2fps from 10fps: source idx 0,5,10,15; ts 0,0.5,1.0,1.5
    assert [(i, t) for i, t, _ in out] == [(0, 0.0), (5, 0.5), (10, 1.0), (15, 1.5)]
    for k, (_, _, px) in enumerate(out):
        assert px.shape == (H, W, 3) and (px == 10 * k).all()


def test_ffmpeg_video_decoder_rejects_garbage_probe():
    decode = ffmpeg_video_decoder(lambda argv, b: b"not json")
    with pytest.raises(ExternalDecoderError, match="unparseable"):
        decode(b"x", 1.0)

    def short_raw(argv, b):
        if argv[0] == "ffprobe":
            return _fake_video_runner(argv, b"\x00fakeh264")
        return b"\x00" * 7  # not a multiple of a frame

    with pytest.raises(ExternalDecoderError, match="not a multiple"):
        ffmpeg_video_decoder(short_raw)(b"x", 1.0)


def test_ffmpeg_audio_decoder_contract():
    sr, ch, ns = 8000, 2, 1600

    def runner(argv, stdin):
        if argv[0] == "ffprobe":
            return json.dumps(
                {"streams": [{"codec_name": "mp3", "sample_rate": str(sr),
                              "channels": ch, "duration": "0.2"}]}
            ).encode()
        pcm = np.arange(ns * ch, dtype="<i2")
        return pcm.tobytes()

    meta, pcm = ffmpeg_audio_decoder(runner)(b"mp3bytes")
    assert meta == AudioMeta(codec="mp3", sample_rate=sr, channels=ch, duration_s=0.2)
    assert pcm.shape == (ns, ch) and pcm.dtype == np.dtype("<i2")
    assert int(pcm[1, 0]) == 2  # interleaved order preserved


def test_builtin_decoder_isolates_corrupt_frames():
    from morphik_core_spark.functions.video import encode_avi_mjpeg

    rng = np.random.default_rng(3)
    good = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(3)]
    avi = bytearray(encode_avi_mjpeg(good, fps=1.0))
    # corrupt the middle frame's JPEG payload (after the second 00dc tag)
    second = avi.index(b"00dc", avi.index(b"00dc") + 4)
    avi[second + 12 : second + 24] = b"\xde\xad" * 6
    meta, frames = builtin_video_decoder()(bytes(avi), 1.0)
    out = list(frames)
    assert len(out) == 3
    oks = [not isinstance(px, Exception) for _, _, px in out]
    assert oks == [True, False, True]  # middle frame failed, others decoded


def test_operator_uses_external_decoder_for_foreign_codecs(spark):
    from morphik_core_spark.functions.video import encode_avi_dib
    from morphik_core_spark.operators.multimodal import extract_video_frame_features

    avi = encode_avi_dib([np.full((6, 5, 3), 200, dtype=np.uint8)], fps=1.0)
    df = spark.createDataFrame(
        [("avi", bytearray(avi)), ("h264", b"\x00fakeh264"), ("junk", b"zz")],
        "media_id string, payload binary",
    )
    got = extract_video_frame_features(
        df, frame_sample_rate=2.0, external_decoder_factory=lambda: ffmpeg_video_decoder(_fake_video_runner)
    ).collect()
    by_id: dict[str, list] = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    assert all(r.ok for r in by_id["avi"])  # builtin path untouched
    assert len(by_id["h264"]) == 4 and all(r.ok for r in by_id["h264"])
    assert by_id["h264"][0].width == W and by_id["h264"][0].height == H
    assert len(by_id["junk"]) == 1 and not by_id["junk"][0].ok
    assert "external" in by_id["junk"][0].err  # both decoders' failures recorded


def test_operator_without_external_decoder_keeps_row_failures(spark):
    from morphik_core_spark.operators.multimodal import extract_video_frame_features

    df = spark.createDataFrame([("h264", b"\x00fakeh264")], "media_id string, payload binary")
    (row,) = extract_video_frame_features(df).collect()
    assert not row.ok and row.err
