"""FLAC codec: lossless round-trips across predictors, stereo modes,
block sizes and bit depths; stream-info parsing; feature-pipeline
dispatch; hypothesis sweep."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.audio import audio_features, decode_audio
from morphik_core_spark.functions.flac import decode_flac, encode_flac, flac_stream_info


def _sig(n, seed, noise=0.02):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    return (0.5 * np.sin(2 * np.pi * 220 * t) + noise * rng.normal(size=n)).clip(-1, 1)


def _ints(x, bps=16):
    half = 1 << (bps - 1)
    return np.clip(np.round(np.atleast_2d(x.T).T * half), -half, half - 1).astype(np.int64)


def _assert_lossless(x, **kw):
    bps = kw.get("bps", 16)
    out, rate = decode_flac(encode_flac(x, 8000, **kw))
    want = _ints(x if x.ndim == 2 else x[:, None], bps)
    got = np.round(out * (1 << (bps - 1))).astype(np.int64)
    assert np.array_equal(got, want)
    assert rate == 8000


def test_mono_lossless():
    _assert_lossless(_sig(9000, 0))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes_lossless(mode):
    m = _sig(6000, 1)
    stereo = np.stack([m, 0.8 * np.roll(m, 77)], axis=1)
    _assert_lossless(stereo, stereo_mode=mode)


def test_small_blocks_and_8bit():
    _assert_lossless(_sig(1000, 2), block_size=192)
    _assert_lossless(_sig(1000, 3), bps=8)


def test_stream_info():
    info = flac_stream_info(encode_flac(_sig(5000, 4), 8000))
    assert (info["sample_rate"], info["channels"], info["bits_per_sample"]) == (8000, 1, 16)
    assert info["total_samples"] == 5000


def test_feature_pipeline_dispatches_flac():
    sig = np.zeros(8000)
    sig[2000:6000] = 0.5 * np.sin(np.linspace(0, 200, 4000))
    f = audio_features(encode_flac(sig, 8000))
    assert 0.2 < f["leading_silence_s"] < 0.3
    assert f["sample_rate"] == 8000
    # and decode_audio still routes RIFF
    from morphik_core_spark.functions.audio import encode_wav

    out, rate = decode_audio(encode_wav(sig, 8000, "pcm16"))
    assert rate == 8000 and out.shape[0] == 8000


def test_not_flac_raises():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxxWAVE")


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(64, 3000),
    seed=st.integers(0, 10_000),
    noise=st.floats(0.0, 0.4),
    block=st.sampled_from([192, 576, 1024]),
    stereo=st.booleans(),
)
def test_lossless_property(n, seed, noise, block, stereo):
    x = _sig(n, seed, noise)
    if stereo:
        x = np.stack([x, -x * 0.5], axis=1)
        _assert_lossless(x, block_size=block, stereo_mode="mid_side")
    else:
        _assert_lossless(x, block_size=block)


def test_constant_subframe_for_silence():
    sig = np.full(2000, 0.25)
    data = encode_flac(sig, 8000)
    # constant blocks compress to almost nothing
    assert len(data) < 200
    _assert_lossless(sig)


def test_lpc_subframe_decodes():
    """Hand-build a frame with an order-2 LPC subframe (the encoder only
    emits fixed predictors, so the LPC decode path needs its own
    fixture) and check the recurrence exactly."""
    from morphik_core_spark.functions.flac import _BitW, _write_utf8_number, _write_residuals

    bps, n = 16, 64
    warm = [100, 130]
    coefs = [3, -1]          # prediction = (3*prev - 1*prevprev) >> shift
    shift = 1
    resid = [((i * 37) % 11) - 5 for i in range(n - 2)]
    vals = list(warm)
    for r in resid:
        acc = coefs[0] * vals[-1] + coefs[1] * vals[-2]
        vals.append((acc >> shift) + r)

    si = _BitW()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(bps - 1, 5); si.write(n, 36)
    head = b"fLaC" + bytes([0x80]) + (len(bytes(si.out)) + 16).to_bytes(3, "big") + bytes(si.out) + bytes(16)

    bw = _BitW()
    bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
    bw.write(7, 4); bw.write(0, 4); bw.write(0, 4); bw.write(4, 3); bw.write(0, 1)
    _write_utf8_number(bw, 0)
    bw.write(n - 1, 16)
    bw.write(0, 8)
    # LPC subframe: type 0b100000 + (order-1)
    bw.write(0, 1); bw.write(32 + (2 - 1), 6); bw.write(0, 1)
    for wv in warm:
        bw.write(wv & 0xFFFF, 16)
    bw.write(15 - 1, 4)          # precision 15 bits
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c & 0x7FFF, 15)
    _write_residuals(bw, resid)
    bw.align(); bw.write(0, 16)

    out, rate = decode_flac(head + bytes(bw.out))
    got = np.round(out[:, 0] * (1 << 15)).astype(np.int64)
    assert np.array_equal(got, np.asarray(vals))


def test_verbatim_subframe_decodes():
    from morphik_core_spark.functions.flac import _BitW, _write_utf8_number

    bps, n = 16, 40
    vals = [((i * 9173) % 4001) - 2000 for i in range(n)]
    si = _BitW()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(bps - 1, 5); si.write(n, 36)
    head = b"fLaC" + bytes([0x80]) + (len(bytes(si.out)) + 16).to_bytes(3, "big") + bytes(si.out) + bytes(16)
    bw = _BitW()
    bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
    bw.write(7, 4); bw.write(0, 4); bw.write(0, 4); bw.write(4, 3); bw.write(0, 1)
    _write_utf8_number(bw, 0)
    bw.write(n - 1, 16); bw.write(0, 8)
    bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM
    for v in vals:
        bw.write(v & 0xFFFF, 16)
    bw.align(); bw.write(0, 16)
    out, _ = decode_flac(head + bytes(bw.out))
    got = np.round(out[:, 0] * (1 << 15)).astype(np.int64)
    assert np.array_equal(got, np.asarray(vals))
