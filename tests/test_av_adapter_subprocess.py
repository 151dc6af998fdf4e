"""Integration test for the REAL subprocess path of the ffmpeg adapter.

`tests/test_av_adapter.py` proves the argv contract against injected
fakes; this module proves the same contract against the actual binaries
when they exist on PATH (reference behavior:
core/parser/video/parse_video.py:91-280 shells into ffmpeg-backed
tooling). Where ffmpeg is absent — e.g. the build container — every test
SKIPS with an explicit reason, never silently passes.

Fixtures are synthesized by ffmpeg itself (lavfi test sources) so the
test needs no binary blobs in the repo. Streamable containers only
(MPEG-TS for video, ADTS for audio): the adapter feeds payloads over
stdin, and ffmpeg cannot seek a pipe to find an MP4's trailing moov atom
— the same constraint a production deployment has, so the test pins it.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from morphik_core_spark.functions.av_adapter import (
    ExternalDecoderError,
    ffmpeg_audio_decoder,
    ffmpeg_video_decoder,
    subprocess_runner,
)

_HAVE_TOOLS = bool(shutil.which("ffmpeg")) and bool(shutil.which("ffprobe"))

needs_ffmpeg = pytest.mark.skipif(
    not _HAVE_TOOLS,
    reason="ffmpeg/ffprobe not on PATH — subprocess path untestable here; "
    "argv contract is covered by fakes in test_av_adapter.py",
)


def _synthesize(args: list[str]) -> bytes:
    """Render a tiny fixture to stdout with the real ffmpeg."""
    proc = subprocess.run(
        ["ffmpeg", "-v", "error", *args, "-"],
        capture_output=True,
        check=True,
        timeout=60,
    )
    return proc.stdout


def _encoder_available(name: str) -> bool:
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-encoders"], capture_output=True, timeout=30
    ).stdout.decode("utf-8", "replace")
    return f" {name} " in out


@needs_ffmpeg
def test_h264_video_decodes_through_real_subprocess():
    if not _encoder_available("libx264"):
        pytest.skip("ffmpeg present but built without libx264")
    payload = _synthesize(
        [
            "-f", "lavfi", "-i", "testsrc=duration=1:size=64x48:rate=10",
            "-c:v", "libx264", "-pix_fmt", "yuv420p", "-f", "mpegts",
        ]
    )
    meta, frames = ffmpeg_video_decoder()(payload, sample_rate=5.0)
    assert meta.codec == "h264"
    assert (meta.width, meta.height) == (64, 48)
    decoded = list(frames)
    # 1 s at fps=5 sampling → ~5 frames; tolerate edge rounding
    assert 3 <= len(decoded) <= 7
    for _idx, ts, px in decoded:
        assert px.shape == (48, 64, 3)
        assert px.dtype.name == "uint8"
        assert ts >= 0.0


@needs_ffmpeg
def test_aac_audio_decodes_through_real_subprocess():
    if not _encoder_available("aac"):
        pytest.skip("ffmpeg present but built without the aac encoder")
    payload = _synthesize(
        [
            "-f", "lavfi", "-i", "sine=frequency=440:duration=1",
            "-c:a", "aac", "-f", "adts",
        ]
    )
    meta, pcm = ffmpeg_audio_decoder()(payload)
    assert meta.codec == "aac"
    assert meta.sample_rate > 0
    assert pcm.ndim == 2 and pcm.shape[1] == meta.channels
    # ~1 s of samples, and a 440 Hz sine is loud: signal must be non-silent
    assert pcm.shape[0] >= meta.sample_rate // 2
    assert int(abs(pcm).max()) > 1000


@needs_ffmpeg
def test_corrupt_payload_is_row_level_error_not_crash():
    with pytest.raises(ExternalDecoderError):
        ffmpeg_video_decoder()(b"this is not a video", sample_rate=5.0)


def test_runner_reports_missing_tool_as_decoder_error():
    # needs no ffmpeg: the production runner must surface a MISSING tool
    # as the row-level ExternalDecoderError, not a raw FileNotFoundError
    run = subprocess_runner()
    with pytest.raises(ExternalDecoderError, match="not installed"):
        run(["definitely-not-a-real-binary-xyz", "-"], b"")
