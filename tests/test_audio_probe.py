"""MP3/Ogg container probes + ID3: the no-decode metadata path for
perceptual audio codecs (mirrors the MP4 probe policy)."""

from __future__ import annotations

import pytest

from morphik_core_spark.functions.audio_probe import (
    build_mp3,
    build_ogg,
    probe_mp3,
    probe_ogg,
    read_id3,
)


def test_mp3_cbr_duration_and_tags():
    mp3 = build_mp3(n_frames=200, bitrate_kbps=128, tags={"TIT2": "My Title", "TPE1": "Artist"})
    info = probe_mp3(mp3)
    assert info["codec"] == "mp3" and info["mpeg_version"] == "1"
    assert info["sample_rate"] == 44100 and info["vbr"] is False
    assert info["bitrate"] == 128000
    assert info["n_frames"] == 200
    # 200 frames * 1152 samples / 44100 Hz
    assert info["duration_s"] == pytest.approx(200 * 1152 / 44100, abs=0.01)
    assert info["tags"]["TIT2"] == "My Title" and info["tags"]["TPE1"] == "Artist"


def test_mp3_vbr_detected_and_mean_bitrate():
    mp3 = build_mp3(n_frames=120, vbr_pattern=[64, 128, 192])
    info = probe_mp3(mp3)
    assert info["vbr"] is True
    assert 64000 < info["bitrate"] < 192000


def test_mp3_resync_past_garbage_prefix():
    mp3 = b"\x00garbage bytes here" + build_mp3(n_frames=50)
    info = probe_mp3(mp3)
    assert info["n_frames"] == 50


def test_mp3_garbage_raises():
    with pytest.raises(ValueError):
        probe_mp3(b"definitely not an mpeg stream" * 10)


def test_id3_v24_syncsafe_and_utf8():
    body = b"\x03" + "Ünïcode Tïtle".encode("utf-8")
    frame = b"TIT2" + bytes([0, 0, (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + b"\x00\x00" + body
    size = len(frame)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
    data = b"ID3\x04\x00\x00" + ss + frame
    assert read_id3(data)["TIT2"] == "Ünïcode Tïtle"
    assert read_id3(b"no tags here") == {}


@pytest.mark.parametrize(
    "codec,rate,channels", [("vorbis", 44100, 2), ("opus", 48000, 1)]
)
def test_ogg_probe(codec, rate, channels):
    ogg = build_ogg(codec=codec, sample_rate=rate, channels=channels, duration_s=2.5)
    info = probe_ogg(ogg)
    assert info["codec"] == codec
    assert info["channels"] == channels
    assert info["duration_s"] == pytest.approx(2.5, abs=0.01)
    if codec == "vorbis":
        assert info["sample_rate"] == rate


def test_ogg_garbage_raises():
    with pytest.raises(ValueError):
        probe_ogg(b"RIFFnotogg")
