"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference renders PDFs to page images (DPI 150), resizes to ≤256 px
JPEG q70, detects blank pages, and feeds images to ColPali
(/root/reference/core/services/ingestion_service.py:1365-1640,
document_service.py:1901-2011). The imaging libraries (PIL/PyMuPDF) are
NOT in this container, so the decode kernels are STUBBED — deterministic
fakes behind the same signatures — while the Spark-side plumbing
(schemas, Arrow batch shape, mapInPandas partitioning) is real and tested.
Swap ``_decode_image_stub`` for a PIL call and nothing else changes.

Design for 100 TB: binary payloads ride in their own column so column
pruning skips them unless a kernel needs bytes; feature extraction is
``mapInPandas`` (one Arrow batch per partition, vectorized per batch);
repartition by size-balanced ranges before the expensive kernel so one
giant video doesn't skew an executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MEDIA_SCHEMA", "attach_media", "extract_image_features", "sample_video_frames"]

# typed metadata travelling with every binary payload
MEDIA_SCHEMA = (
    "media_id string, kind string, mime string, width int, height int, "
    "duration_s double, payload binary"
)


def attach_media(df: DataFrame, payload_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap a binary column into the standard media contract."""
    return df.select(
        "*",
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.length(F.col(payload_col)).alias("payload_bytes"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake pixels derived from the payload.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` →
    resize ≤256 px → RGB array. Raises like PIL would on empty input.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty image payload")
    rng = np.random.default_rng(np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64))
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def extract_image_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Decode → feature vector per image, via mapInPandas.

    Output: (media_id, ok, err, mean_r, mean_g, mean_b, is_blank).
    Failures are row-level (ok=false + err), never task-level — a corrupt
    image must not kill a 100 TB job.
    """
    out_schema = f"{id_col} string, ok boolean, err string, mean_r double, mean_g double, mean_b double, is_blank boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = _decode_image_stub(payload)
                    means = px.reshape(-1, 3).mean(axis=0)
                    # blank-page heuristic mirrors the reference: near-uniform
                    is_blank = bool(px.std() < 1.0)
                    rows.append((mid, True, None, *[float(m) for m in means], is_blank))
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "ok", "err", "mean_r", "mean_g", "mean_b", "is_blank"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    frame_sample_rate: float = 1.0,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
) -> DataFrame:
    """Frame-sampling plan: one row per sampled timestamp
    (reference parse_video.py:91-280 samples at frame_sample_rate fps).

    Pure relational explode — the actual frame decode would be a
    mapInPandas over (media_id, ts) with the video bytes joined in.
    """
    n_frames = F.greatest(F.floor(F.col(duration_col) * frame_sample_rate).cast("int"), F.lit(1))
    return df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts", F.col("frame_idx") / F.lit(frame_sample_rate))
