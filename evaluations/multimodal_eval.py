"""Multimodal dedup/similarity quality eval — deterministic, model-free.

Measures what the image perceptual hashes and the audio log-mel
descriptor actually buy on planted ground truth (the multimodal analog of
dedup_eval.py's planted text near-dups):

- **Image near-dup**: N structured base images; each gets K perturbed
  variants (pixel noise, 2x rescale, brightness shift) = positives, all
  cross-base pairs = negatives. For ahash/dhash/phash: positive/negative
  Hamming-distance distributions and precision/recall at the banded
  operator's default threshold (distance <= 3, bands=4).
- **Audio near-dup**: tones + chirps with detune/noise variants; cosine
  separation of the log-mel descriptor (positive vs hardest-negative
  margins).

Run: python evaluations/multimodal_eval.py  — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphik_core_spark.functions import imagehash
from morphik_core_spark.functions.audio import audio_embedding
from morphik_core_spark.functions.image import to_grayscale

N_BASES = 12
THRESHOLD = 3  # image_near_dup_pairs default (bands=4 pigeonhole bound)


def _base_image(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    gx, gy = rng.uniform(-1, 1), rng.uniform(-1, 1)
    base = 128 + (gx * (xx - w / 2) + gy * (yy - h / 2)) * (200.0 / (h + w))
    for _ in range(3):
        cy, cx, r = rng.integers(8, h - 8), rng.integers(8, w - 8), rng.integers(6, 14)
        base += (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r) * rng.uniform(-70, 70)
    g = np.clip(base + rng.normal(0, 3, (h, w)), 0, 255)
    return np.repeat(g[..., None], 3, axis=2).astype(np.uint8)


def _variants(img: np.ndarray, seed: int) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    noise = np.clip(img.astype(np.int32) + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    bright = np.clip(img.astype(np.int32) + 12, 0, 255).astype(np.uint8)
    return [noise, up, bright]


def image_hash_eval() -> dict:
    bases = [_base_image(s) for s in range(N_BASES)]
    out = {}
    for method in ("ahash", "dhash", "phash"):
        fn = getattr(imagehash, method)
        base_h = [fn(to_grayscale(b)) for b in bases]
        pos, neg = [], []
        for i, b in enumerate(bases):
            for v in _variants(b, 100 + i):
                pos.append(imagehash.hamming64(base_h[i], fn(to_grayscale(v))))
            for j in range(i + 1, N_BASES):
                neg.append(imagehash.hamming64(base_h[i], base_h[j]))
        tp = sum(1 for d in pos if d <= THRESHOLD)
        fp = sum(1 for d in neg if d <= THRESHOLD)
        out[method] = {
            "pos_mean_dist": round(float(np.mean(pos)), 2),
            "neg_mean_dist": round(float(np.mean(neg)), 2),
            "recall": round(tp / len(pos), 4),
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
            "false_positives": fp,
        }
    return out


def audio_embedding_eval() -> dict:
    rate = 8000
    t = np.arange(rate) / rate
    rng = np.random.default_rng(17)

    def chirp(f0, f1):
        return 0.4 * np.sin(2 * np.pi * (f0 + (f1 - f0) * t / 2) * t)

    clips = [0.5 * np.sin(2 * np.pi * f * t) for f in (220, 440, 880, 1760, 3000)]
    clips += [chirp(200, 800), chirp(1000, 2500)]
    embs = [audio_embedding(c, rate) for c in clips]
    pos_sims, margins = [], []
    for i, c in enumerate(clips):
        variants = [
            c + rng.normal(0, 0.01, size=rate),  # noise
            np.roll(c, rate // 7),  # time shift
            c * 0.6,  # gain change
        ]
        for v in variants:
            ev = audio_embedding(v, rate)
            own = float(embs[i] @ ev)
            others = max(float(embs[j] @ ev) for j in range(len(clips)) if j != i)
            pos_sims.append(own)
            margins.append(own - others)
    return {
        "pos_cosine_mean": round(float(np.mean(pos_sims)), 4),
        "margin_mean": round(float(np.mean(margins)), 4),
        "margin_min": round(float(np.min(margins)), 4),
        "all_variants_matched": bool(all(m > 0 for m in margins)),
    }


def main() -> None:
    print(
        json.dumps(
            {
                "metric": "multimodal_dedup_quality",
                "image_hash": image_hash_eval(),
                "audio_embedding": audio_embedding_eval(),
            }
        )
    )


if __name__ == "__main__":
    main()
