"""WAV audio decode + features with stdlib wave/audioop-free numpy.

The reference treats audio/video through external parsers (SURVEY §2.1
video parse; assemblyai/ffmpeg behind config). Those libraries aren't in
this container; WAV (PCM) is decodable with the stdlib ``wave`` module +
numpy, so the audio modality gets a REAL kernel for the canonical
interchange format: duration/sample-rate/channel metadata plus the
loudness/activity features a training-data pipeline filters on.
Compressed codecs (mp3/aac/ogg) raise and surface as row-level parse
failures, same isolation as every other kernel.
"""

from __future__ import annotations

import io
import wave

import numpy as np

__all__ = ["decode_wav", "audio_features"]

_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] shaped (n, channels), rate).

    8-bit PCM is unsigned per the WAV spec; 16/32-bit are signed. 24-bit
    and non-PCM compression raise.
    """
    if data is None or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    try:
        wf = wave.open(io.BytesIO(data), "rb")
    except wave.Error as exc:
        raise ValueError(f"unreadable WAV: {exc}") from exc
    with wf:
        width = wf.getsampwidth()
        dtype = _WIDTH_DTYPE.get(width)
        if dtype is None:
            raise ValueError(f"unsupported sample width {width} bytes")
        channels = wf.getnchannels()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (8 * width - 1))
    if channels > 1:
        samples = samples.reshape(-1, channels)
    else:
        samples = samples.reshape(-1, 1)
    return samples, rate


def audio_features(data: bytes) -> dict:
    """WAV bytes → the filter features a data pipeline needs: duration,
    rate, channels, RMS loudness, peak, zero-crossing rate, leading/
    trailing silence (below 1% of full scale)."""
    samples, rate = decode_wav(data)
    n = samples.shape[0]
    if n == 0:
        raise ValueError("WAV contains no frames")
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if n > 1 else 0.0
    active = np.flatnonzero(np.abs(mono) > 0.01)
    lead = float(active[0] / rate) if active.size else float(n / rate)
    trail = float((n - 1 - active[-1]) / rate) if active.size else float(n / rate)
    return {
        "duration_s": n / rate,
        "sample_rate": rate,
        "channels": samples.shape[1],
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        "leading_silence_s": lead,
        "trailing_silence_s": trail,
    }
