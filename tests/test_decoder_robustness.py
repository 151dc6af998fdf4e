"""Corruption robustness: every binary decoder must FAIL FAST (any
exception is acceptable — mapInPandas isolates rows) on truncated and
bit-flipped versions of valid inputs. What this sweep actually guards
against is the other failure modes: infinite loops, unbounded memory,
or silently returning success on garbage."""

from __future__ import annotations

import numpy as np
import pytest

SEEDS = [0, 1, 2]


_FIX_CACHE = None


def _fixtures():
    # encoding all 11 fixtures is pure-Python-expensive (progressive JPEG,
    # FLAC); build once per process — every test reads, none mutates
    # (bitflip tests copy into a fresh bytearray first)
    global _FIX_CACHE
    if _FIX_CACHE is not None:
        return _FIX_CACHE
    from morphik_core_spark.functions.audio import encode_wav
    from morphik_core_spark.functions.flac import encode_flac
    from morphik_core_spark.functions.gif import encode_gif
    from morphik_core_spark.functions.image import encode_png
    from morphik_core_spark.functions.jpeg import encode_jpeg_baseline, encode_jpeg_progressive
    from morphik_core_spark.functions.mp4 import build_mp4_moov
    from morphik_core_spark.functions.tiff import encode_tiff
    from morphik_core_spark.functions.video import encode_avi_dib, encode_avi_mjpeg
    from morphik_core_spark.sources.warc import build_warc

    import sys, os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from test_pdf import make_pdf_objstm, make_pdf_pages

    from morphik_core_spark.functions.exif import build_exif_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    pal = img // 64 * 64  # <=64 distinct colors for GIF
    sig = np.sin(np.linspace(0, 50, 3000)) * 0.5
    _FIX_CACHE = {
        "png": encode_png(img),
        "png_adam7_16": encode_png(img, filter_type=4, interlace=True, bits=16),
        "gif": encode_gif(pal),
        "tiff": encode_tiff(img, compression=5),
        "tiff_tiled_16": encode_tiff(img, compression=5, tile=(16, 16), bits=16),
        "jpeg": encode_jpeg_baseline(img),
        "jpeg_prog": encode_jpeg_progressive(img),
        "wav": encode_wav(sig, 8000, "ima_adpcm"),
        "flac": encode_flac(sig, 8000),
        "mp4": build_mp4_moov(5.0, [{"kind": "video", "codec": "avc1", "width": 64, "height": 48}]),
        "avi_mjpeg": encode_avi_mjpeg([img, img], fps=5.0),
        "avi_dib": encode_avi_dib([img, img], fps=5.0),
        "warc": build_warc([("http://x", "2026-01-01T00:00:00Z", 200, "text/html", b"<p>x</p>")]),
        "pdf_pages": make_pdf_pages([
            b"BT /F1 12 Tf 72 700 Td (alpha beta) Tj ET",
            b"BT /F1 10 Tf 1 0 0 1 100 300 Tm (gamma) Tj ET",
        ]),
        "pdf_objstm": make_pdf_objstm([b"BT /F1 12 Tf 72 700 Td (packed) Tj ET"]),
        "pdf_layout": make_pdf_pages([
            b"BT /F1 10 Tf 1 0 0 1 72 40 Tm (foot) Tj 1 0 0 1 72 700 Tm (head) Tj ET",
        ]),
        "exif_jpeg": build_exif_jpeg(),
    }
    return _FIX_CACHE


def _decoders():
    from morphik_core_spark.functions.audio import decode_audio
    from morphik_core_spark.functions.image import decode_image
    from morphik_core_spark.functions.mp4 import probe_mp4
    from morphik_core_spark.functions.video import decode_dib_frame, decode_jpeg, parse_avi
    from morphik_core_spark.functions.exif import extract_exif
    from morphik_core_spark.functions.pdf_render import extract_pdf_text_layout, rasterize_pdf_pages
    from morphik_core_spark.sources.warc import iter_warc_records

    def full_avi_decode(b):
        fps, w, h, frames, codec = parse_avi(b)
        for f in frames:
            (decode_jpeg if codec == "MJPG" else lambda x: decode_dib_frame(x, w, h))(f)

    return {
        "png": decode_image, "png_adam7_16": decode_image,
        "gif": decode_image, "tiff": decode_image, "tiff_tiled_16": decode_image,
        "jpeg": decode_image, "jpeg_prog": decode_image,
        "wav": decode_audio, "flac": decode_audio,
        "mp4": probe_mp4,
        "avi_mjpeg": full_avi_decode,
        "avi_dib": full_avi_decode,
        "warc": lambda b: list(iter_warc_records(b)),
        # rasterization must survive corrupt page trees/content streams
        # (the round-4 lesson: header count fields are allocation bombs —
        # ObjStm /N, MediaBox dims, and content sizes are all capped)
        "pdf_pages": lambda b: rasterize_pdf_pages(b, dpi=36),
        "pdf_objstm": lambda b: rasterize_pdf_pages(b, dpi=36),
        "pdf_layout": extract_pdf_text_layout,
        "exif_jpeg": extract_exif,
    }


@pytest.mark.parametrize("name", sorted(_decoders().keys()))
def test_truncations_fail_fast_or_decode(name):
    fix = _fixtures()[name]
    dec = _decoders()[name]
    rng = np.random.default_rng(13)
    cuts = sorted({int(x) for x in rng.integers(1, len(fix), size=12)} | {8, 16, len(fix) // 2})
    for cut in cuts:
        try:
            dec(fix[:cut])  # a prefix MAY decode (e.g. metadata-only probes)
        except Exception:
            pass  # any exception = row-isolated; the test is that we RETURN


@pytest.mark.parametrize("name", sorted(_decoders().keys()))
@pytest.mark.parametrize("seed", SEEDS)
def test_bitflips_fail_fast_or_decode(name, seed):
    fix = bytearray(_fixtures()[name])
    dec = _decoders()[name]
    rng = np.random.default_rng(seed)
    for _ in range(8):
        mutated = bytearray(fix)
        for pos in rng.integers(0, len(fix), size=max(2, len(fix) // 200)):
            mutated[pos] ^= int(rng.integers(1, 256))
        try:
            dec(bytes(mutated))
        except Exception:
            pass


def test_pure_noise_rejected_by_all():
    rng = np.random.default_rng(3)
    noise = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8))
    for name, dec in _decoders().items():
        with pytest.raises(Exception):
            dec(noise)
