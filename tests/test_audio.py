"""WAV decode + audio features."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from morphik_core_spark.functions.audio import audio_features, decode_wav


def make_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            data = (samples * 32767).astype(np.int16).tobytes()
        elif width == 1:
            data = ((samples * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
        else:
            data = (samples * (2**31 - 1)).astype(np.int32).tobytes()
        wf.writeframes(data)
    return buf.getvalue()


def test_decode_roundtrip_16bit():
    t = np.linspace(0, 1, 8000, endpoint=False)
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(make_wav(sine))
    assert rate == 8000 and samples.shape == (8000, 1)
    assert np.allclose(samples[:, 0], sine, atol=1e-3)


def test_features_sine_and_silence():
    rate = 8000
    sine = 0.5 * np.sin(2 * np.pi * 440 * np.linspace(0, 1, rate, endpoint=False))
    padded = np.concatenate([np.zeros(rate // 2), sine, np.zeros(rate // 4)])
    f = audio_features(make_wav(padded, rate=rate))
    assert f["duration_s"] == pytest.approx(1.75)
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2) / np.sqrt(1.75), rel=0.05)
    assert f["peak"] == pytest.approx(0.5, abs=0.01)
    assert f["leading_silence_s"] == pytest.approx(0.5, abs=0.01)
    assert f["trailing_silence_s"] == pytest.approx(0.25, abs=0.01)


def test_stereo_and_8bit():
    stereo = np.tile(np.linspace(-0.5, 0.5, 100)[:, None], (1, 2))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        wf.writeframes((stereo * 32767).astype(np.int16).tobytes())
    samples, rate = decode_wav(buf.getvalue())
    assert samples.shape == (100, 2)
    f8 = audio_features(make_wav(np.zeros(100) + 0.25, width=1))
    assert f8["channels"] == 1 and f8["peak"] == pytest.approx(0.25, abs=0.02)


def test_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"ID3\x04mp3 data here")
    with pytest.raises(ValueError):
        decode_wav(b"")


def test_extract_audio_features_operator(spark):
    from morphik_core_spark.operators.multimodal import extract_audio_features

    sine = 0.3 * np.sin(2 * np.pi * 100 * np.linspace(0, 0.5, 4000, endpoint=False))
    df = spark.createDataFrame(
        [("a1", make_wav(sine)), ("a2", b"not audio"), ("a3", None)],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert rows["a1"].ok and rows["a1"].duration_s == pytest.approx(0.5)
    assert rows["a1"].sample_rate == 8000
    assert not rows["a2"].ok and not rows["a3"].ok  # row-level isolation


def test_g711_and_float_round_trips():
    import numpy as np

    from morphik_core_spark.functions.audio import decode_wav, encode_wav

    t = np.linspace(0, 1, 4000)
    sig = (0.6 * np.sin(2 * np.pi * 220 * t)).clip(-1, 1)
    for fmt, tol in [("mulaw", 0.02), ("alaw", 0.02), ("float32", 1e-7), ("pcm32", 1e-8)]:
        out, rate = decode_wav(encode_wav(sig, 4000, fmt))
        assert rate == 4000
        err = float(np.abs(out[: len(sig), 0] - sig).max())
        assert err < tol, (fmt, err)


def test_g711_sign_symmetry():
    import numpy as np

    from morphik_core_spark.functions.audio import decode_wav, encode_wav

    sig = np.array([0.5, -0.5, 0.25, -0.25, 0.03, -0.03])
    for fmt in ("mulaw", "alaw"):
        out, _ = decode_wav(encode_wav(sig, 8000, fmt))
        got = out[: len(sig), 0]
        # +x and -x decode to exact negations
        assert float(np.abs(got[0::2] + got[1::2]).max()) < 1e-12, fmt


def test_ima_adpcm_round_trip_quality():
    import numpy as np

    from morphik_core_spark.functions.audio import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, 8000)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.size)).clip(-1, 1)
    out, rate = decode_wav(encode_wav(sig, 8000, "ima_adpcm"))
    got = out[: len(sig), 0]
    err = np.abs(got - sig)
    # 4-bit codec: tight on the bulk, bounded on transients
    assert float(np.quantile(err, 0.99)) < 0.1
    assert float(np.corrcoef(got, sig)[0, 1]) > 0.98


def test_audio_features_on_compressed_formats():
    import numpy as np

    from morphik_core_spark.functions.audio import audio_features, encode_wav

    t = np.linspace(0, 1, 8000)
    sig = np.zeros_like(t)
    sig[2000:6000] = 0.5 * np.sin(2 * np.pi * 100 * t[2000:6000])
    for fmt in ("mulaw", "alaw", "ima_adpcm", "float32"):
        f = audio_features(encode_wav(sig, 8000, fmt))
        assert 0.2 < f["leading_silence_s"] < 0.3, fmt
        assert f["rms"] > 0.1, fmt


def test_unsupported_format_tag_raises():
    import struct

    import numpy as np
    import pytest

    from morphik_core_spark.functions.audio import decode_wav, encode_wav

    data = bytearray(encode_wav(np.zeros(100), 8000, "pcm16"))
    i = data.find(b"fmt ")
    data[i + 8 : i + 10] = struct.pack("<H", 85)  # mp3-in-wav
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(data))


def test_pcm24_round_trip():
    import numpy as np

    from morphik_core_spark.functions.audio import decode_wav, encode_wav

    t = np.linspace(0, 1, 3000)
    sig = (0.7 * np.sin(2 * np.pi * 180 * t)).clip(-1, 1)
    out, rate = decode_wav(encode_wav(sig, 8000, "pcm24"))
    assert rate == 8000
    err = float(np.abs(out[: len(sig), 0] - sig).max())
    # quantization step 1/2^23 plus the (2^23-1)/2^23 scale convention
    assert err < 3e-7
    # negative samples survive the sign extension
    assert float(out[:, 0].min()) < -0.6


def test_log_mel_pure_tone_energy_lands_in_right_band():
    from morphik_core_spark.functions.audio import _mel_filterbank, log_mel_spectrogram

    rate, f = 8000, 1000.0
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * f * t)
    m = log_mel_spectrogram(sig, rate, n_mels=24)
    assert m.shape[1] == 24
    hot = int(np.argmax(m.mean(axis=0)))
    # the 1 kHz band index from the same filterbank's center freqs
    fb = _mel_filterbank(24, 1024, rate)
    freqs = np.fft.rfftfreq(1024, d=1.0 / rate)
    centers = (fb * freqs[None, :]).sum(axis=1) / fb.sum(axis=1)
    assert abs(centers[hot] - f) < 300  # within a band of the tone


def test_spectral_stats_separate_tone_from_noise():
    from morphik_core_spark.functions.audio import spectral_stats

    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 500 * t)
    noise = np.random.default_rng(3).uniform(-0.5, 0.5, size=rate)
    st_t, st_n = spectral_stats(tone, rate), spectral_stats(noise, rate)
    assert st_t["flatness"] < 0.01 < st_n["flatness"]  # tone is peaky
    assert abs(st_t["centroid_hz"] - 500) < 150
    assert st_n["bandwidth_hz"] > st_t["bandwidth_hz"]


def test_audio_embedding_similarity_ladder():
    from morphik_core_spark.functions.audio import audio_embedding

    rate = 8000
    t = np.arange(rate) / rate
    rng = np.random.default_rng(5)
    a = 0.5 * np.sin(2 * np.pi * 440 * t)
    a_noisy = a + rng.normal(0, 0.01, size=rate)
    b = 0.5 * np.sin(2 * np.pi * 2000 * t)
    ea, ean, eb = (audio_embedding(x, rate) for x in (a, a_noisy, b))
    assert abs(np.linalg.norm(ea) - 1.0) < 1e-9
    same = float(ea @ ean)
    diff = float(ea @ eb)
    assert same > 0.97
    assert same > diff + 0.05


def test_extract_audio_embeddings_sparkside(spark):
    from morphik_core_spark.functions.audio import encode_wav
    from morphik_core_spark.operators.multimodal import extract_audio_embeddings
    from morphik_core_spark.operators import similarity

    rate = 8000
    t = np.arange(rate) / rate
    clips = {
        "tone_a": 0.5 * np.sin(2 * np.pi * 440 * t),
        "tone_a2": 0.5 * np.sin(2 * np.pi * 443 * t),
        "tone_b": 0.5 * np.sin(2 * np.pi * 3000 * t),
    }
    rows = [(k, encode_wav(v, rate)) for k, v in clips.items()] + [("bad", b"xx")]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = extract_audio_embeddings(df)
    got = {r.media_id: r for r in out.collect()}
    assert got["bad"].ok is False
    assert len(got["tone_a"].embedding) == 48
    # the embedding column drives the existing kNN operator unchanged
    emb = out.filter("ok").select(F.col("media_id").alias("vec_id"), "embedding")
    q = emb.filter("vec_id = 'tone_a'").select(
        F.lit("q").alias("q_id"), F.col("embedding").alias("qv")
    )
    top = similarity.knn_brute_force(emb, q, k=2, id_col="vec_id").collect()
    assert [r.vec_id for r in top] == ["tone_a", "tone_a2"]  # nearest = the 3 Hz detune
