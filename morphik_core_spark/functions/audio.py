"""WAV audio decode + features, stdlib-free numpy RIFF parsing.

The reference treats audio/video through external parsers (SURVEY §2.1
video parse; assemblyai/ffmpeg behind config). Those libraries aren't in
this container, so the canonical interchange containers get REAL kernels:

- PCM 8/16/24/32-bit (format 1);
- IEEE float32/64 (format 3);
- G.711 mu-law and A-law (formats 7/6) — telephony corpora;
- IMA ADPCM (format 17, the 4-bit DVI codec) — legacy voice recordings.

Fixture encoders for every format keep the decoder paths testable
libless (`encode_wav`). Perceptual codecs (mp3/aac/ogg) raise and
surface as row-level parse failures, same isolation as every other
kernel. The ADPCM inner loop is per-nibble Python — inherent to its
predictor recursion and fine at feature-extraction sizes; everything
else is vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_wav",
    "decode_audio",
    "audio_features",
    "encode_wav",
    "log_mel_spectrogram",
    "audio_embedding",
    "spectral_stats",
    "silence_segments",
]

_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _riff_chunks(data: bytes):
    if data is None or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    n = len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        yield cid, data[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned


def _mulaw_decode(u: np.ndarray) -> np.ndarray:
    u = (~u) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant.astype(np.int64) << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.float64) / 32768.0


def _alaw_decode(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    # G.711 A-law sign bit SET means positive (opposite of mu-law)
    return np.where(sign == 0, -mag, mag).astype(np.float64) / 32768.0


def _ima_decode_block(block: bytes, channels: int, samples_per_block: int) -> np.ndarray:
    """One IMA ADPCM block → (samples_per_block, channels) int16 values."""
    out = np.zeros((samples_per_block, channels), dtype=np.int64)
    pred = np.zeros(channels, dtype=np.int64)
    index = np.zeros(channels, dtype=np.int64)
    for c in range(channels):
        pred[c] = struct.unpack_from("<h", block, c * 4)[0]
        index[c] = block[c * 4 + 2]
        out[0, c] = pred[c]
    pos = 4 * channels
    # nibbles come in 4-byte words per channel, interleaved by channel
    s = 1
    while s < samples_per_block:
        for c in range(channels):
            word = block[pos : pos + 4]
            pos += 4
            for b in word:
                for nib in (b & 0x0F, b >> 4):
                    if s >= samples_per_block:
                        break
                    step = int(_IMA_STEPS[index[c]])
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    if nib & 8:
                        pred[c] -= diff
                    else:
                        pred[c] += diff
                    pred[c] = max(-32768, min(32767, pred[c]))
                    index[c] = max(0, min(88, index[c] + int(_IMA_INDEX[nib & 7])))
                    out[s, c] = pred[c]
                    s += 1
                else:
                    continue
                break
        # in multi-channel IMA the sample counter advances per 8-sample
        # word group across channels; mono (our fixture surface) is the
        # simple sequential case handled above
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] shaped (n, channels), rate)."""
    fmt = None
    payload = None
    for cid, body in _riff_chunks(data):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if tag == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if channels < 1:
        raise ValueError("WAV with zero channels")

    if tag == 1:  # PCM
        width = bits // 8
        if width == 3:  # 24-bit: compose little-endian triplets, sign-extend
            usable = len(payload) - (len(payload) % (3 * channels))
            b = np.frombuffer(payload[:usable], dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = v.astype(np.float64) / float(1 << 23)
        else:
            dtype = _WIDTH_DTYPE.get(width)
            if dtype is None:
                raise ValueError(f"unsupported sample width {width} bytes")
            usable = len(payload) - (len(payload) % (width * channels))
            samples = np.frombuffer(payload[:usable], dtype=dtype).astype(np.float64)
            if width == 1:
                samples = (samples - 128.0) / 128.0
            else:
                samples = samples / float(2 ** (bits - 1))
    elif tag == 3:  # IEEE float
        dtype = {32: np.float32, 64: np.float64}.get(bits)
        if dtype is None:
            raise ValueError(f"unsupported float width {bits}")
        width = bits // 8
        usable = len(payload) - (len(payload) % (width * channels))
        samples = np.frombuffer(payload[:usable], dtype=dtype).astype(np.float64)
    elif tag == 7:  # G.711 mu-law
        samples = _mulaw_decode(np.frombuffer(payload, dtype=np.uint8))
    elif tag == 6:  # G.711 A-law
        samples = _alaw_decode(np.frombuffer(payload, dtype=np.uint8))
    elif tag == 17:  # IMA ADPCM
        if channels != 1:
            raise ValueError("IMA ADPCM: mono only")
        block_align = struct.unpack_from("<H", fmt, 12)[0]
        if len(fmt) >= 20:
            spb = struct.unpack_from("<H", fmt, 18)[0]
        else:
            spb = (block_align - 4) * 2 + 1
        chunks = []
        for off in range(0, len(payload) - block_align + 1, block_align):
            chunks.append(_ima_decode_block(payload[off : off + block_align], 1, spb))
        if not chunks:
            raise ValueError("IMA ADPCM: no complete block")
        samples = np.concatenate(chunks).astype(np.float64) / 32768.0
        return samples.reshape(-1, 1), rate
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")

    if channels > 1:
        samples = samples[: (samples.size // channels) * channels]
        samples = samples.reshape(-1, channels)
    else:
        samples = samples.reshape(-1, 1)
    return samples, rate


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Sniff + decode WAV (any supported format tag) or FLAC."""
    if data is not None and data[:4] == b"fLaC":
        from morphik_core_spark.functions.flac import decode_flac

        return decode_flac(data)
    return decode_wav(data)


def audio_features(data: bytes) -> dict:
    """WAV/FLAC bytes → the filter features a data pipeline needs:
    duration, rate, channels, RMS loudness, peak, zero-crossing rate,
    leading/trailing silence (below 1% of full scale)."""
    samples, rate = decode_audio(data)
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


# ------------------------------------------------------------------ encode


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    mag = np.clip(np.abs(x * 32768.0).astype(np.int64), 0, 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    u = (np.where(x < 0, 0x80, 0) | (exp << 4) | mant).astype(np.uint8)
    return (~u) & 0xFF


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    mag = np.clip(np.abs(x * 32768.0).astype(np.int64), 0, 32767)
    exp = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 7, 0)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    a = (np.where(x >= 0, 0x80, 0) | (exp << 4) | mant).astype(np.uint8)
    return a ^ 0x55


def _ima_encode_block(samples: np.ndarray, spb: int) -> bytes:
    pred = int(samples[0])
    # seed the block's step index near the typical sample delta — the
    # cold-start otherwise spends ~10 samples climbing from step 7 and
    # butchers the block head (the block header exists precisely so
    # encoders can do this)
    deltas = np.abs(np.diff(samples[:spb]))
    typical = float(np.mean(deltas)) if deltas.size else 0.0
    index = int(np.argmin(np.abs(_IMA_STEPS - typical)))
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for s in samples[1:spb]:
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # reconstruct exactly like the decoder to stay in sync
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[nib & 7])))
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def encode_wav(
    samples: np.ndarray, rate: int, fmt: str = "pcm16"
) -> bytes:
    """(n, channels) float64 in [-1, 1] → WAV bytes. Formats: pcm8,
    pcm16, pcm32, float32, mulaw, alaw, ima_adpcm (mono). Fixture aid."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if fmt == "pcm16":
        tag, bits = 1, 16
        payload = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == "pcm8":
        tag, bits = 1, 8
        payload = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif fmt == "pcm24":
        tag, bits = 1, 24
        v = (np.clip(x, -1, 1).reshape(-1) * ((1 << 23) - 1)).astype(np.int32)
        u = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        trip = np.stack([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=1)
        payload = trip.astype(np.uint8).tobytes()
    elif fmt == "pcm32":
        tag, bits = 1, 32
        payload = (np.clip(x, -1, 1) * (2**31 - 1)).astype("<i4").tobytes()
    elif fmt == "float32":
        tag, bits = 3, 32
        payload = x.astype("<f4").tobytes()
    elif fmt == "mulaw":
        tag, bits = 7, 8
        payload = _mulaw_encode(x.reshape(-1)).astype(np.uint8).tobytes()
    elif fmt == "alaw":
        tag, bits = 6, 8
        payload = _alaw_encode(x.reshape(-1)).astype(np.uint8).tobytes()
    elif fmt == "ima_adpcm":
        if channels != 1:
            raise ValueError("ima_adpcm fixture encoder is mono")
        tag, bits = 17, 4
        ints = (np.clip(x[:, 0], -1, 1) * 32767).astype(np.int64)
        spb = 505  # 256-byte blocks: 4 header + 252 data bytes = 504 nibbles
        blocks = []
        for off in range(0, len(ints), spb):
            chunk = ints[off : off + spb]
            if len(chunk) < spb:
                chunk = np.pad(chunk, (0, spb - len(chunk)))
            blocks.append(_ima_encode_block(chunk, spb))
        payload = b"".join(blocks)
        block_align = 256
        fmt_body = struct.pack("<HHIIHHHH", tag, 1, rate, rate * block_align // spb, block_align, bits, 2, spb)
        return _riff(fmt_body, payload)
    else:
        raise ValueError(f"unknown fixture format {fmt}")
    width = bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", tag, channels, rate, rate * channels * width, channels * width, bits
    )
    return _riff(fmt_body, payload)


def _riff(fmt_body: bytes, payload: bytes) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) % 2:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------- spectral features


def _mel_filterbank(n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank (Slaney-style mel = 2595*log10(1+f/700)),
    shape (n_mels, n_fft//2 + 1)."""
    fmax = fmax if fmax is not None else rate / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    pts = from_mel(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def log_mel_spectrogram(
    samples: np.ndarray,
    rate: int,
    n_fft: int = 1024,
    hop: int = 512,
    n_mels: int = 24,
    top_db: float = 60.0,
) -> np.ndarray:
    """Log-mel energies, shape (frames, n_mels) — the standard acoustic
    feature front-end (Hann window → |rFFT|² → mel filterbank → log,
    floored ``top_db`` below the clip's peak band à la power_to_db).
    The relative floor matters: an absolute epsilon floor makes silent
    bands encode the numeric floor, so any added noise rewrites most of
    the vector — clamping to peak−top_db keeps descriptors stable under
    noise. Mono input (channels averaged); all numpy, no audio libs."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if len(mono) < n_fft:
        mono = np.pad(mono, (0, n_fft - len(mono)))
    window = np.hanning(n_fft)
    n_frames = 1 + (len(mono) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * window
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = power @ _mel_filterbank(n_mels, n_fft, rate).T
    m = np.log(mel + 1e-20)
    return np.maximum(m, m.max() - top_db * np.log(10.0) / 10.0)


def audio_embedding(samples: np.ndarray, rate: int, n_mels: int = 24) -> np.ndarray:
    """Fixed-size acoustic descriptor: per-band mean and std of the
    log-mel spectrogram (2*n_mels dims), L2-normalized. Deterministic,
    model-free — drops straight into the repo's cosine kNN / near-dup /
    SemDeDup operators as an ``array<double>`` column, giving audio the
    same similarity/dedup surface text and images have."""
    m = log_mel_spectrogram(samples, rate, n_mels=n_mels)
    m = m - m.mean()  # per-clip mean normalization (CMN): a recording's
    # overall level / noise floor is common-mode, the descriptor should
    # encode spectral SHAPE — without this, mild broadband noise shifts
    # every silent band and tanks cosine similarity between variants
    v = np.concatenate([m.mean(axis=0), m.std(axis=0)])
    nrm = np.linalg.norm(v)
    return v / nrm if nrm > 0 else v


def spectral_stats(samples: np.ndarray, rate: int, n_fft: int = 1024, hop: int = 512) -> dict:
    """Frame-averaged spectral shape features: centroid (Hz), rolloff-85%
    (Hz), bandwidth (Hz), flatness — the audio-quality analog of the text
    quality signals (detects tone-only, silence-heavy, clipped uploads)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if len(mono) < n_fft:
        mono = np.pad(mono, (0, n_fft - len(mono)))
    window = np.hanning(n_fft)
    n_frames = 1 + (len(mono) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    power = np.abs(np.fft.rfft(mono[idx] * window, axis=1)) ** 2
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    tot = power.sum(axis=1) + 1e-20
    centroid = (power * freqs).sum(axis=1) / tot
    cum = np.cumsum(power, axis=1)
    roll_bin = np.argmax(cum >= 0.85 * tot[:, None], axis=1)
    bandwidth = np.sqrt((power * (freqs[None, :] - centroid[:, None]) ** 2).sum(axis=1) / tot)
    flatness = np.exp(np.mean(np.log(power + 1e-20), axis=1)) / (power.mean(axis=1) + 1e-20)
    return {
        "centroid_hz": float(centroid.mean()),
        "rolloff_hz": float(freqs[roll_bin].mean()),
        "bandwidth_hz": float(bandwidth.mean()),
        "flatness": float(flatness.mean()),
    }


def silence_segments(
    samples: np.ndarray,
    rate: int,
    *,
    frame_ms: int = 20,
    silence_rms: float = 0.01,
    min_silence_ms: int = 300,
    min_segment_ms: int = 100,
) -> list[tuple[float, float]]:
    """Voice-activity segmentation by silence gaps: (start_s, end_s)
    spans of activity, split wherever the per-frame RMS stays below
    ``silence_rms`` (fraction of full scale) for at least
    ``min_silence_ms`` — the pre-ASR chunking step (reference ships
    whole files to AssemblyAI, `core/parser/video/parse_video.py`; an
    engine-side splitter is what makes hour-long audio batchable).

    Pure numpy frame-RMS walk, one pass; segments shorter than
    ``min_segment_ms`` are dropped (clicks). Mono-mixes multi-channel
    input the same way `audio_features` does.
    """
    if samples.ndim == 2:
        samples = samples.mean(axis=1)
    n = len(samples)
    if n == 0:
        return []
    flen = max(1, rate * frame_ms // 1000)
    n_frames = -(-n // flen)
    pad = np.zeros(n_frames * flen)
    pad[:n] = samples
    frames = pad.reshape(n_frames, flen)
    rms = np.sqrt((frames * frames).mean(axis=1))
    active = rms >= silence_rms

    min_sil_frames = max(1, min_silence_ms // frame_ms)
    segs: list[tuple[float, float]] = []
    start = None
    silent_run = 0
    for i, a in enumerate(active):
        if a:
            if start is None:
                start = i
            silent_run = 0
        elif start is not None:
            silent_run += 1
            if silent_run >= min_sil_frames:
                segs.append((start, i - silent_run + 1))
                start, silent_run = None, 0
    if start is not None:
        end = n_frames
        while end > start and not active[end - 1]:
            end -= 1
        segs.append((start, end))
    out = []
    for s, e in segs:
        t0, t1 = s * flen / rate, min(e * flen, n) / rate
        if (t1 - t0) * 1000 >= min_segment_ms:
            out.append((round(t0, 6), round(t1, 6)))
    return out
