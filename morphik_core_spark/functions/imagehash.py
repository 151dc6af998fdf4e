"""Perceptual image hashing — the image rung of the dedup ladder.

Text dedup has exact-md5 / MinHash / SimHash / semantic; images get the
same structure here: a compact perceptual fingerprint (64-bit int) that
survives re-encoding, resizing, and mild noise, plus Hamming-band
blocking so near-dup pair generation is an equi-join, never all-pairs —
exactly the banded-LSH shape used for MinHash
(:mod:`morphik_core_spark.operators.dedup`).

Three standard hashes, all deterministic pure-numpy over the repo's own
decoders (PNG/BMP/GIF/TIFF/JPEG — no imaging library):

- ``ahash``  — average hash: 8x8 block-mean grayscale, bit = above mean.
- ``dhash``  — difference hash: 9x8 block-mean grayscale, bit = horizontal
  gradient sign (robust default; Krawetz's dHash).
- ``phash``  — DCT hash: 32x32 block-mean grayscale -> 2D DCT-II -> low
  frequency 8x8 corner minus DC, bit = above median (most robust to
  gamma/scaling, costliest).

All return a SIGNED int64 (the 64-bit pattern two's-complemented) so the
value round-trips Spark's LongType exactly.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "block_mean_resize",
    "ahash",
    "dhash",
    "phash",
    "hamming64",
    "hash_bands",
]


def _to_i64(bits: np.ndarray) -> int:
    """Pack a flat boolean array (MSB first) into a signed 64-bit int."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(bool(b))
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area downscale: non-overlapping pixel blocks with
    boundaries floor(i*H/out_h), block value = float mean. Works for any
    input size >= output size (upscale falls back to nearest)."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
        return gray[ys][:, xs].astype(np.float64)
    yb = (np.arange(out_h + 1) * h) // out_h
    xb = (np.arange(out_w + 1) * w) // out_w
    g = gray.astype(np.float64)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        rows = g[yb[i] : yb[i + 1]]
        for j in range(out_w):
            out[i, j] = rows[:, xb[j] : xb[j + 1]].mean()
    return out


def ahash(gray: np.ndarray, hash_size: int = 8) -> int:
    small = block_mean_resize(gray, hash_size, hash_size)
    return _to_i64(small > small.mean())


def dhash(gray: np.ndarray, hash_size: int = 8) -> int:
    small = block_mean_resize(gray, hash_size, hash_size + 1)
    return _to_i64(small[:, 1:] > small[:, :-1])


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


def phash(gray: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    n = hash_size * highfreq_factor
    small = block_mean_resize(gray, n, n)
    d = _dct_matrix(n)
    coeffs = d @ small @ d.T
    low = coeffs[:hash_size, :hash_size].ravel()
    med = np.median(low[1:])  # DC excluded from the median AND compared
    return _to_i64(low > med)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def hash_bands(value: int, bands: int = 4) -> list[int]:
    """Split a 64-bit hash into ``bands`` equal bit-slices (band id folded
    in). Pigeonhole guarantee: two hashes within Hamming distance
    ``bands - 1`` share at least one band verbatim — so a bucket
    equi-join on (band_idx, band_bits) finds every pair at distance
    <= bands-1, and candidates are verified with the exact distance."""
    width = 64 // bands
    mask = (1 << width) - 1
    u = value & ((1 << 64) - 1)
    return [(idx << width) | ((u >> (idx * width)) & mask) for idx in range(bands)]
