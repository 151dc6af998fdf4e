"""Perceptual image hashing: robustness invariants + the banded
near-dup pair generation (image analog of the MinHash-LSH tests)."""

from __future__ import annotations

import numpy as np
import pytest

from morphik_core_spark.functions import imagehash
from morphik_core_spark.functions.image import encode_png, to_grayscale
from morphik_core_spark.operators import multimodal

RNG = np.random.default_rng(21)


def _img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Structured image (gradient + blob) — perceptual hashes on pure
    noise are meaningless; real images have low-frequency structure."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    # gradient ORIENTATION varies by seed so distinct seeds give images
    # with genuinely different low-frequency structure
    gx, gy = rng.uniform(-1, 1), rng.uniform(-1, 1)
    base = 128 + (gx * (xx - w / 2) + gy * (yy - h / 2)) * (200.0 / (h + w))
    cy, cx, r = rng.integers(8, h - 8), rng.integers(8, w - 8), 12
    blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r) * 80.0
    g = np.clip(base + blob + rng.normal(0, 4, size=(h, w)), 0, 255)
    return np.repeat(g[..., None], 3, axis=2).astype(np.uint8)


@pytest.mark.parametrize("method", ["ahash", "dhash", "phash"])
def test_hash_survives_noise_and_rescale_but_separates_images(method):
    fn = getattr(imagehash, method)
    a = _img(1)
    noisy = np.clip(a.astype(np.int32) + RNG.integers(-2, 3, size=a.shape), 0, 255).astype(np.uint8)
    big = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)  # 2x upscale
    other = _img(99)
    ha = fn(to_grayscale(a))
    assert imagehash.hamming64(ha, fn(to_grayscale(noisy))) <= 6
    assert imagehash.hamming64(ha, fn(to_grayscale(big))) <= 6
    assert imagehash.hamming64(ha, fn(to_grayscale(other))) > 16


def test_hash_is_64bit_signed_and_deterministic():
    g = to_grayscale(_img(5))
    for fn in (imagehash.ahash, imagehash.dhash, imagehash.phash):
        v = fn(g)
        assert -(1 << 63) <= v < (1 << 63)
        assert v == fn(g.copy())


def test_hash_bands_pigeonhole():
    v = imagehash.dhash(to_grayscale(_img(7)))
    # flip 3 bits (bands=4 guarantees distance <= 3 shares a band)
    w = v
    for bit in (3, 17, 60):
        w ^= 1 << bit
        if w >= 1 << 63:
            w -= 1 << 64
        elif w < -(1 << 63):
            w += 1 << 64
    assert imagehash.hamming64(v, w) == 3
    assert set(imagehash.hash_bands(v)) & set(imagehash.hash_bands(w))


def test_image_perceptual_hash_and_near_dup_pairs(spark):
    imgs = {
        "a": _img(1),
        "a_noisy": np.clip(_img(1).astype(np.int32) + RNG.integers(-2, 3, size=_img(1).shape), 0, 255).astype(np.uint8),
        "b": _img(50),
        "c": _img(80),
        "bad": None,  # corrupt payload must stay row-level
    }
    rows = [
        (k, encode_png(v) if v is not None else b"not an image") for k, v in imgs.items()
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    hashed = multimodal.image_perceptual_hash(df, method="dhash")
    got = {r.media_id: r for r in hashed.collect()}
    assert got["bad"].ok is False and got["bad"].err
    assert all(got[k].ok for k in ("a", "a_noisy", "b", "c"))
    assert got["a"].width == 64 and got["a"].height == 64

    pairs = multimodal.image_near_dup_pairs(
        hashed.filter("ok"), max_distance=3, bands=4
    ).collect()
    keys = {(r.id_a, r.id_b) for r in pairs}
    assert ("a", "a_noisy") in keys
    assert all({p[0], p[1]} != {"a", "b"} for p in keys)


def test_near_dup_pairs_bucket_cap_guards_hot_hash(spark):
    # 50 identical hashes -> every band bucket holds 50 rows; cap at 10
    # must drop them all (and the operator must not explode quadratically)
    rows = [(f"i{k}", 12345) for k in range(50)] + [("x", 99999), ("y", 99999 ^ 1)]
    df = spark.createDataFrame(rows, "media_id string, hash long")
    out = multimodal.image_near_dup_pairs(df, max_distance=3, bands=4, max_bucket_size=10).collect()
    keys = {(r.id_a, r.id_b) for r in out}
    assert keys == {("x", "y")}
