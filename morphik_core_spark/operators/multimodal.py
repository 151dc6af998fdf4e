"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference renders PDFs to page images (DPI 150), resizes to ≤256 px
JPEG q70, detects blank pages, and feeds images to ColPali
(/root/reference/core/services/ingestion_service.py:1365-1640,
document_service.py:1901-2011). PIL/PyMuPDF are NOT in this container;
PNG, BMP, GIF, baseline TIFF, and JPEG (baseline AND progressive)
decode is REAL (functions/image|jpeg|gif|tiff, stdlib + numpy),
including the reference's resize-to-256 and grayscale-extrema
blank-page rule. Remaining exotic vintages (arithmetic JPEG,
tiled/16-bit TIFF, WebP/AVIF) raise inside the kernel and surface as
row-level parse failures; swap functions/image.decode_image for a PIL
call to widen coverage and nothing else changes.

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

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "extract_image_features",
    "extract_pdf_page_images",
    "extract_audio_features",
    "extract_video_frame_features",
    "sample_video_frames",
    "detect_scene_cuts",
    "segment_audio",
    "image_perceptual_hash",
    "extract_image_exif",
    "image_near_dup_pairs",
    "extract_audio_embeddings",
    "page_patch_multivectors",
    "text_query_multivector",
    "video_frame_hashes",
    "video_near_dup_pairs",
]

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


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_side: int = 256,
) -> DataFrame:
    """Decode (PNG/BMP/baseline JPEG, real) → resize ≤ ``max_side`` →
    features, via mapInPandas.

    Output: (media_id, ok, err, width, height, mean_r, mean_g, mean_b,
    is_blank) — width/height are the ORIGINAL dimensions, means are taken
    on the resized pixels (what the reference feeds downstream), is_blank
    is the reference's grayscale-extrema rule. Failures are row-level
    (ok=false + err), never task-level — a corrupt image must not kill a
    100 TB job.
    """
    from morphik_core_spark.functions.image import decode_image, is_blank_image, resize_max_side

    out_schema = (
        f"{id_col} string, ok boolean, err string, width int, height int, "
        "mean_r double, mean_g double, mean_b double, is_blank boolean"
    )
    cols = [id_col, "ok", "err", "width", "height", "mean_r", "mean_g", "mean_b", "is_blank"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_image(bytes(payload) if payload is not None else None)
                    h, w = px.shape[:2]
                    small = resize_max_side(px, max_side)
                    means = small.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (mid, True, None, w, h, *[float(m) for m in means], is_blank_image(small))
                    )
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


_AUDIO_FEATURES = [
    "duration_s",
    "sample_rate",
    "channels",
    "rms",
    "peak",
    "zero_crossing_rate",
    "leading_silence_s",
    "trailing_silence_s",
]


def extract_audio_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Decode (WAV, real) → loudness/activity features, via mapInPandas.

    Output: (media_id, ok, err, duration_s, sample_rate, channels, rms,
    peak, zero_crossing_rate, leading_silence_s, trailing_silence_s).
    Compressed codecs fail per row (ok=false + err), never per task.
    """
    from morphik_core_spark.functions.audio import audio_features

    out_schema = (
        f"{id_col} string, ok boolean, err string, duration_s double, "
        "sample_rate int, channels int, rms double, peak double, "
        "zero_crossing_rate double, leading_silence_s double, trailing_silence_s double"
    )
    cols = [id_col, "ok", "err", *_AUDIO_FEATURES]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    f = audio_features(bytes(payload) if payload is not None else None)
                    rows.append((mid, True, None, *[f[k] for k in _AUDIO_FEATURES]))
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), *([None] * len(_AUDIO_FEATURES))))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def extract_video_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_sample_rate: float = 1.0,
    max_side: int = 256,
    external_decoder_factory=None,
) -> DataFrame:
    """REAL video frame sampling + decode for MJPEG- and DIB-AVI payloads
    (reference parse_video.py:91-280 samples at ``frame_sample_rate`` fps
    and feeds frames to the image pipeline; here every sampled frame runs
    through the same resize/blank kernels as still images).

    ``external_decoder_factory`` is the declared modern-codec boundary
    (functions/av_adapter.ffmpeg_video_decoder, or any factory returning
    the same ``(payload, sample_rate) -> (meta, frames)`` contract): when
    the built-in decoder rejects a payload (H.264/HEVC/...), the external
    decoder gets it, its frames flow through the SAME feature kernel, and
    a payload neither can decode fails only its own row. The factory runs
    once per Python worker so process/pool startup is amortized.

    Output: one row per SAMPLED frame — (media_id, ok, err, frame_idx,
    frame_ts, width, height, mean_r, mean_g, mean_b, is_blank). Corrupt
    payloads yield a single ok=false row; a corrupt individual frame
    fails only its own row. mapInPandas keeps the payload bytes
    executor-side; at 100 TB repartition by payload size first so one
    long video cannot skew an executor (same note as the image kernel).
    """
    from morphik_core_spark.functions.av_adapter import builtin_video_decoder
    from morphik_core_spark.functions.image import is_blank_image, resize_max_side

    out_schema = (
        f"{id_col} string, ok boolean, err string, frame_idx int, frame_ts double, "
        "width int, height int, mean_r double, mean_g double, mean_b double, is_blank boolean"
    )
    cols = [id_col, "ok", "err", "frame_idx", "frame_ts", "width", "height",
            "mean_r", "mean_g", "mean_b", "is_blank"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        builtin = builtin_video_decoder()
        external = external_decoder_factory() if external_decoder_factory else None
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else None
                try:
                    _meta, frames = builtin(data, frame_sample_rate)
                except Exception as exc:  # noqa: BLE001 — try the declared boundary
                    if external is None:
                        rows.append((mid, False, str(exc), *([None] * 8)))
                        continue
                    try:
                        _meta, frames = external(data, frame_sample_rate)
                    except Exception as exc2:  # noqa: BLE001 — row-level isolation
                        rows.append((mid, False, f"{exc}; external: {exc2}", *([None] * 8)))
                        continue
                for idx, ts, px in frames:
                    if isinstance(px, Exception):  # per-frame failure, in place
                        rows.append((mid, False, str(px), idx, ts, *([None] * 6)))
                        continue
                    h, w = px.shape[:2]
                    small = resize_max_side(px, max_side)
                    means = small.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (mid, True, None, idx, ts, w, h,
                         *[float(m) for m in means], is_blank_image(small))
                    )
            yield pd.DataFrame(rows, columns=cols)

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


def extract_pdf_page_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_side: int = 256,
) -> DataFrame:
    """PDF page-image extraction for the ColPali path: per PDF, emit one
    row per page with the same features as `extract_image_features`.

    Two-tier, covering both corpus shapes the reference renders
    (document_service.py:1901-2011, ingestion_service.py:1449-1640):

    1. **Scanned corpora** store pages AS embedded raster images — decode
       them directly (`functions/pdf.extract_pdf_images`: DCT through the
       JPEG codec, Flate/raw bitmaps).
    2. **Text/vector PDFs** have no embedded rasters — rasterize each
       page via the glyph-box renderer
       (`functions/pdf_render.rasterize_pdf_pages`, DPI 150 like the
       reference) so text-only documents produce one real page bitmap per
       page instead of vanishing from the visual-retrieval path.

    Output: (media_id, page_idx, ok, err, width, height, mean_r, mean_g,
    mean_b, is_blank). A PDF with neither embedded images nor parseable
    pages yields one ok=true row with page_idx = -1 and NULL features (so
    'no page images' is visible, not silent); a broken PDF yields one
    ok=false row.
    """
    from morphik_core_spark.functions.image import is_blank_image, resize_max_side
    from morphik_core_spark.functions.pdf import extract_pdf_images
    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    out_schema = (
        f"{id_col} string, page_idx int, ok boolean, err string, width int, height int, "
        "mean_r double, mean_g double, mean_b double, is_blank boolean"
    )
    cols = [id_col, "page_idx", "ok", "err", "width", "height", "mean_r", "mean_g", "mean_b", "is_blank"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    data = bytes(payload) if payload is not None else b""
                    images = extract_pdf_images(data)
                    if not images:
                        # text/vector pages: glyph-box rasterization at
                        # the reference's DPI, grayscale -> RGB planes
                        images = [
                            np.repeat(gray[:, :, None], 3, axis=2)
                            for gray in rasterize_pdf_pages(data, dpi=150)
                        ]
                    if not images:
                        rows.append((mid, -1, True, None, None, None, None, None, None, None))
                        continue
                    for pi, px in enumerate(images):
                        h, w = px.shape[:2]
                        small = resize_max_side(px, max_side)
                        means = small.reshape(-1, 3).mean(axis=0)
                        rows.append(
                            (mid, pi, True, None, w, h, *[float(m) for m in means], is_blank_image(small))
                        )
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, -1, False, str(exc), None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def image_perceptual_hash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    method: str = "dhash",
) -> DataFrame:
    """Perceptual fingerprint per image (ahash | dhash | phash from
    :mod:`morphik_core_spark.functions.imagehash`) — the image analog of
    the text SimHash stage. Output: (media_id, ok, err, width, height,
    hash) with hash a signed 64-bit int; failures are row-level.

    Scale shape: pure map (mapInPandas over the payload column, nothing
    shuffles); feed the result to :func:`image_near_dup_pairs` for the
    banded pair generation.
    """
    from morphik_core_spark.functions import imagehash
    from morphik_core_spark.functions.image import decode_image, to_grayscale

    hasher = {"ahash": imagehash.ahash, "dhash": imagehash.dhash, "phash": imagehash.phash}[method]
    out_schema = f"{id_col} string, ok boolean, err string, width int, height int, hash bigint"
    cols = [id_col, "ok", "err", "width", "height", "hash"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_image(bytes(payload) if payload is not None else None)
                    h, w = px.shape[:2]
                    rows.append((mid, True, None, w, h, hasher(to_grayscale(px))))
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def image_near_dup_pairs(
    hashes: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "hash",
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance on the perceptual
    hash — banded exactly like MinHash-LSH: split the 64-bit hash into
    ``bands`` bit-slices, bucket-join on any shared band (pigeonhole: a
    pair within distance ``bands - 1`` MUST share a band, so recall is
    exact for ``max_distance <= bands - 1``), then verify candidates with
    the true popcount distance.

    Same hot-bucket cap as `dedup.lsh_pairs` (a banner image repeated a
    million times would otherwise make one bucket quadratic).
    Output: (id_a, id_b, distance), id_a < id_b.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.select(F.col(id_col), F.col(hash_col))
    banded = h.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    (
                        F.lit(idx * (1 << width))
                        + F.shiftrightunsigned(F.col(hash_col), idx * width).bitwiseAND(F.lit(mask))
                    ).alias(f"b{idx}")
                    for idx in range(bands)
                ]
            )
        ).alias("band"),
    )
    sizes = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(F.col("n") <= max_bucket_size).select("band")
    banded = banded.join(F.broadcast(ok), "band")
    a = banded.select(F.col("band"), F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"))
    b = banded.select(F.col("band"), F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"))
    cand = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def extract_audio_embeddings(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_mels: int = 24,
) -> DataFrame:
    """Decode (WAV/FLAC, real) → fixed-size log-mel acoustic descriptor
    (2*n_mels dims, L2-normalized) + spectral-shape stats, via mapInPandas.

    The embedding column drops straight into the cosine kNN / near-dup /
    SemDeDup operators, giving audio corpora the same similarity and
    dedup surface as text and images. Output: (media_id, ok, err,
    embedding array<double>, centroid_hz, rolloff_hz, bandwidth_hz,
    flatness); failures are row-level.
    """
    from morphik_core_spark.functions.audio import audio_embedding, decode_audio, spectral_stats

    out_schema = (
        f"{id_col} string, ok boolean, err string, embedding array<double>, "
        "centroid_hz double, rolloff_hz double, bandwidth_hz double, flatness double"
    )
    cols = [id_col, "ok", "err", "embedding", "centroid_hz", "rolloff_hz", "bandwidth_hz", "flatness"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = decode_audio(bytes(payload) if payload is not None else None)
                    emb = [float(x) for x in audio_embedding(samples, rate, n_mels=n_mels)]
                    st = spectral_stats(samples, rate)
                    rows.append(
                        (mid, True, None, emb, st["centroid_hz"], st["rolloff_hz"],
                         st["bandwidth_hz"], st["flatness"])
                    )
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _pool_page_patches(gray: np.ndarray, grid: int, cell: int) -> list[list[float]]:
    """(H, W) grayscale page -> grid×grid patch vectors, each the L2-
    normalized cell×cell mean-ink map of its region. Pure numpy, exact
    given identical bitmaps."""
    ink = (255.0 - gray.astype(np.float64)) / 255.0
    h, w = ink.shape
    vecs: list[list[float]] = []
    for gy in range(grid):
        for gx in range(grid):
            patch = ink[
                h * gy // grid : h * (gy + 1) // grid,
                w * gx // grid : w * (gx + 1) // grid,
            ]
            ph, pw = patch.shape
            v = np.empty(cell * cell, dtype=np.float64)
            for cy in range(cell):
                for cx in range(cell):
                    sub = patch[
                        ph * cy // cell : ph * (cy + 1) // cell,
                        pw * cx // cell : pw * (cx + 1) // cell,
                    ]
                    v[cy * cell + cx] = float(sub.mean()) if sub.size else 0.0
            n = float(np.linalg.norm(v))
            vecs.append([float(x) for x in (v / n if n > 0 else v)])
    return vecs


def page_patch_multivectors(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid: int = 4,
    cell: int = 4,
    dpi: int = 54,
) -> DataFrame:
    """ColPali-shaped multivectors from PDF pages WITHOUT a model: each
    page rasterizes through the glyph-box renderer
    (functions/pdf_render), splits into a grid×grid patch grid, and each
    patch becomes an L2-normalized cell×cell ink-density vector — one
    ``array<array<double>>`` multivector per page, ready for
    operators/maxsim (the layout-feature analog of ColPali's per-patch
    embeddings; a live model drops into the same schema via
    model_adapters.remote_multivector_udf).

    What this buys: the full visual-retrieval pipeline — page →
    multivector → MaxSim late interaction — runs end-to-end,
    deterministic and testable, on text/vector PDFs that previously had
    no visual representation at all. Output: (media_id, page_idx, ok,
    err, multivector); broken PDFs fail their own row.
    """
    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    out_schema = (
        f"{id_col} string, page_idx int, ok boolean, err string, "
        "multivector array<array<double>>"
    )
    cols = [id_col, "page_idx", "ok", "err", "multivector"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    pages = rasterize_pdf_pages(
                        bytes(payload) if payload is not None else b"", dpi=dpi
                    )
                    for pi, gray in enumerate(pages):
                        rows.append((mid, pi, True, None, _pool_page_patches(gray, grid, cell)))
                    if not pages:
                        rows.append((mid, -1, True, None, None))
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, -1, False, str(exc), None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def text_query_multivector(
    text: str, grid: int = 4, cell: int = 4, dpi: int = 54, font_size: float = 18.0
) -> list[list[float]]:
    """Driver-side query encoder for the model-free visual path: render
    the query text onto a letter page with the SAME glyph-box renderer
    and pool it with the SAME patch kernel, so query and page vectors
    live in one feature space (what a ColPali query encoder does with a
    model). Long queries wrap every ~40 glyphs."""
    from morphik_core_spark.functions.pdf_render import rasterize_page

    lines = []
    words, cur = text.split(), ""
    for wd in words:
        if len(cur) + len(wd) + 1 > 40:
            lines.append(cur)
            cur = wd
        else:
            cur = f"{cur} {wd}".strip()
    if cur:
        lines.append(cur)
    ops = [b"BT /F1 %d Tf" % int(font_size)]
    y = 720
    for line in lines:
        safe = line.replace("\\", "").replace("(", "").replace(")", "").encode("latin-1", "ignore")
        ops.append(b"1 0 0 1 72 %d Tm (%s) Tj" % (y, safe))
        y -= int(font_size * 1.3)
    ops.append(b"ET")
    gray = rasterize_page(b" ".join(ops), (0.0, 0.0, 612.0, 792.0), dpi=dpi)
    return _pool_page_patches(gray, grid, cell)


def extract_image_exif(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """EXIF metadata → typed columns, via mapInPandas (Arrow-batched,
    row-level failure isolation like every decoder here — 'no Exif
    segment' surfaces as ok=false + err, never a task failure).

    The signals a curation pipeline keys on: burst/device dedup via
    (make, model, datetime_original), orientation-fix before feature
    extraction, GPS presence for privacy filtering. Pure map — no
    shuffle; pairs with `image_perceptual_hash` on the same scan.
    """
    from morphik_core_spark.functions.exif import extract_exif

    out_schema = (
        f"{id_col} string, ok boolean, err string, make string, model string, "
        "orientation int, datetime_original string, exposure_time double, "
        "f_number double, iso int, pixel_width int, pixel_height int, "
        "gps_lat double, gps_lon double, has_gps boolean"
    )
    cols = [
        id_col, "ok", "err", "make", "model", "orientation",
        "datetime_original", "exposure_time", "f_number", "iso",
        "pixel_width", "pixel_height", "gps_lat", "gps_lon", "has_gps",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = extract_exif(bytes(payload) if payload is not None else b"")
                    rows.append(
                        (
                            mid, True, None, m["make"], m["model"], m["orientation"],
                            m["datetime_original"], m["exposure_time"], m["f_number"],
                            m["iso"], m["pixel_width"], m["pixel_height"],
                            m["gps_lat"], m["gps_lon"],
                            m["gps_lat"] is not None and m["gps_lon"] is not None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc)) + (None,) * 12)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def detect_scene_cuts(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_sample_rate: float = 1.0,
    cut_threshold: float = 30.0,
    external_decoder_factory=None,
) -> DataFrame:
    """Scene-change detection over sampled video frames: mean absolute
    grayscale difference between consecutive sampled frames, cut where
    it exceeds ``cut_threshold`` (0-255 scale) — the shot-boundary pass
    that decides WHICH frames are worth feature-extraction/captioning
    in a video ingestion pipeline (one keyframe per scene instead of
    one per second).

    Same decode stack and contracts as `extract_video_frame_features`:
    built-in MJPEG/DIB-AVI decoder, ``external_decoder_factory`` as the
    declared modern-codec boundary, row-level failure isolation. Diffs
    are sequential WITHIN one video (per-row Python over that video's
    frames — bounded by one payload); videos parallelize across the
    scan. Output: one row per sampled frame — (media_id, ok, err,
    frame_idx, frame_ts, diff, is_cut); frame 0 has diff NULL / is_cut
    false (a first frame starts scene 0, it doesn't "cut").
    """
    import numpy as np

    from morphik_core_spark.functions.av_adapter import builtin_video_decoder

    out_schema = (
        f"{id_col} string, ok boolean, err string, frame_idx int, "
        "frame_ts double, diff double, is_cut boolean"
    )
    cols = [id_col, "ok", "err", "frame_idx", "frame_ts", "diff", "is_cut"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        builtin = builtin_video_decoder()
        external = external_decoder_factory() if external_decoder_factory else None
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else None
                try:
                    _meta, frames = builtin(data, frame_sample_rate)
                except Exception as exc:  # noqa: BLE001 — declared boundary next
                    if external is None:
                        rows.append((mid, False, str(exc), None, None, None, None))
                        continue
                    try:
                        _meta, frames = external(data, frame_sample_rate)
                    except Exception as exc2:  # noqa: BLE001 — row-level isolation
                        rows.append(
                            (mid, False, f"{exc}; external: {exc2}", None, None, None, None)
                        )
                        continue
                prev = None
                for idx, ts, px in frames:
                    if isinstance(px, Exception):
                        rows.append((mid, False, str(px), idx, ts, None, None))
                        prev = None  # a lost frame breaks the diff chain
                        continue
                    gray = px.astype(np.float64).mean(axis=2)
                    if prev is None or prev.shape != gray.shape:
                        rows.append((mid, True, None, idx, ts, None, False))
                    else:
                        d = float(np.abs(gray - prev).mean())
                        rows.append((mid, True, None, idx, ts, d, d > cut_threshold))
                    prev = gray
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def segment_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    min_silence_ms: int = 300,
    silence_rms: float = 0.01,
) -> DataFrame:
    """Silence-gap audio segmentation → one row per speech/activity
    span: (media_id, ok, err, segment_idx, start_s, end_s, duration_s).
    The pre-ASR chunking pass — hour-long recordings become
    batchable spans that drop straight into the ingestion chunker, the
    same role the scene-cut pass plays for video keyframes. Decode is
    the real WAV/FLAC stack; row-level failure isolation as everywhere;
    files that are ALL silence yield ok=true with zero segment rows
    (distinguishable from decode failure)."""
    from morphik_core_spark.functions.audio import decode_audio, silence_segments

    out_schema = (
        f"{id_col} string, ok boolean, err string, segment_idx int, "
        "start_s double, end_s double, duration_s double"
    )
    cols = [id_col, "ok", "err", "segment_idx", "start_s", "end_s", "duration_s"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = decode_audio(
                        bytes(payload) if payload is not None else None
                    )
                    segs = silence_segments(
                        samples, rate,
                        min_silence_ms=min_silence_ms, silence_rms=silence_rms,
                    )
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None, None))
                    continue
                if not segs:
                    rows.append((mid, True, None, None, None, None, None))
                for i, (t0, t1) in enumerate(segs):
                    rows.append((mid, True, None, i, t0, t1, round(t1 - t0, 6)))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def video_frame_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int = 32,
    method: str = "dhash",
) -> DataFrame:
    """Per-video frame fingerprints: decode the MJPEG-AVI payload (the
    real pure-Python decoder; modern codecs route through the ffmpeg
    adapter upstream), sample up to ``max_frames`` evenly spaced frames,
    and perceptual-hash each — the video analog of
    `image_perceptual_hash`, one row per sampled frame.

    Scale shape: pure map (mapInPandas), the decode cost is the
    operator; nothing shuffles. Output: (media_id, ok, err, n_frames,
    frame_idx, hash); a failed decode yields ONE row with ok = false so
    the corpus-health rollup still sees the video.
    """
    from morphik_core_spark.functions import imagehash
    from morphik_core_spark.functions.image import to_grayscale
    from morphik_core_spark.functions.jpeg import decode_jpeg
    from morphik_core_spark.functions.video import parse_avi_mjpeg

    hasher = {"ahash": imagehash.ahash, "dhash": imagehash.dhash, "phash": imagehash.phash}[method]
    out_schema = f"{id_col} string, ok boolean, err string, n_frames int, frame_idx int, hash bigint"
    cols = [id_col, "ok", "err", "n_frames", "frame_idx", "hash"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _fps, _w, _h, frames = parse_avi_mjpeg(
                        bytes(payload) if payload is not None else None
                    )
                    n = len(frames)
                    if n > max_frames:
                        step = n / max_frames
                        picks = [int(i * step) for i in range(max_frames)]
                    else:
                        picks = list(range(n))
                    for fi in picks:
                        px = decode_jpeg(frames[fi])
                        rows.append((mid, True, None, n, fi, hasher(to_grayscale(px))))
                except Exception as exc:  # noqa: BLE001 — row-level isolation
                    rows.append((mid, False, str(exc), None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    threshold: float = 0.5,
    id_col: str = "media_id",
    hash_col: str = "hash",
    max_hash_df: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """Near-duplicate videos by frame-fingerprint set overlap: two videos
    are candidates when they share ANY sampled frame hash (an inverted
    index on the hash — the exact-frame block, same structure as the
    shingle index in `containment_pairs`), then candidates verify with
    the true Jaccard of their distinct frame-hash sets via the
    collect_set → array_intersect pattern (candidate-bounded, zero
    pair-grain shuffles).

    ``max_hash_df`` drops degenerate frames shared by more videos than
    the cap (solid-color intros, test cards) before pair generation —
    the hot-block valve every pair generator in this repo carries.

    Output: (id_a, id_b, jaccard ≥ threshold), id_a < id_b.
    """
    fh = (
        frame_hashes.filter(F.col("ok") & F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
        .distinct()
    )
    hot = (
        fh.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_hash_df)
        .select("_h")
    )
    fh = fh.join(F.broadcast(hot), "_h", "left_anti")
    a = fh.select(F.col("_h"), F.col("_id").alias("id_a"))
    b = fh.select(F.col("_h"), F.col("_id").alias("id_b"))
    cand = (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = fh.groupBy("_id").agg(F.collect_set("_h").alias("hs"))
    joined = (
        cand.join(sets.select(F.col("_id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        joined.withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), decimals)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
