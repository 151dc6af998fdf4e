"""MP4 container metadata probe."""

from __future__ import annotations

import struct

import pytest

from morphik_core_spark.functions.mp4 import build_mp4_moov, probe_mp4


def test_probe_reads_duration_tracks_codec_dims():
    data = build_mp4_moov(12.5, [
        {"kind": "video", "codec": "avc1", "width": 1920, "height": 1080, "duration_s": 12.5},
        {"kind": "audio", "codec": "mp4a", "duration_s": 12.4},
    ])
    info = probe_mp4(data)
    assert info["duration_s"] == 12.5
    v, a = info["tracks"]
    assert (v["kind"], v["codec"], v["width"], v["height"]) == ("video", "avc1", 1920, 1080)
    assert (a["kind"], a["codec"]) == ("audio", "mp4a")
    assert abs(a["duration_s"] - 12.4) < 1e-9


def test_probe_handles_version1_mvhd():
    # hand-build a v1 mvhd (64-bit duration)
    payload = struct.pack(">B3x", 1) + bytes(16) + struct.pack(">IQ", 90000, 90000 * 7) + bytes(72)
    mvhd = struct.pack(">I4s", 8 + len(payload), b"mvhd") + payload
    moov = struct.pack(">I4s", len(mvhd) + 8, b"moov") + mvhd
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom\x00\x00\x02\x00"
    info = probe_mp4(ftyp + moov)
    assert info["duration_s"] == 7.0 and info["timescale"] == 90000


def test_probe_rejects_non_mp4():
    with pytest.raises(ValueError):
        probe_mp4(b"RIFF\x00\x00\x00\x00AVI LIST")
    with pytest.raises(ValueError):
        probe_mp4(b"\x00" * 4)


def test_probe_requires_moov():
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom\x00\x00\x02\x00"
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(ftyp)
