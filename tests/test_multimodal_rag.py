"""Multimodal plumbing, RAG assembly, rerank hook."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators import rag
from morphik_core_spark.operators.multimodal import (
    attach_media,
    extract_image_features,
    sample_video_frames,
)
from morphik_core_spark.operators.rerank import make_reranker, token_overlap_scores
from morphik_core_spark.operators.retrieval import retrieve_chunks


def _png(color, size=(8, 6)) -> bytes:
    import numpy as np

    from morphik_core_spark.functions.image import encode_png

    px = np.zeros((size[1], size[0], 3), dtype=np.uint8)
    px[:] = color
    return encode_png(px)


def test_image_features_row_level_failure_isolation(spark):
    df = spark.createDataFrame(
        [
            ("m1", _png((200, 30, 60))),
            ("m2", b""),
            ("m3", None),
            ("m4", b"RIFF\x00\x00\x00\x00WEBPVP8 webp is not supported"),
            ("m5", b"GIF89a corrupt gif body \x00\x01\x02\x03\x04\x05"),
        ],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in extract_image_features(df).collect()}
    assert rows["m1"].ok and (rows["m1"].mean_r, rows["m1"].mean_g, rows["m1"].mean_b) == (200.0, 30.0, 60.0)
    assert (rows["m1"].width, rows["m1"].height) == (8, 6)
    assert rows["m1"].is_blank  # uniform color → blank by the extrema rule
    assert not rows["m2"].ok and "empty" in rows["m2"].err
    assert not rows["m3"].ok  # corrupt rows never kill the job
    assert not rows["m4"].ok and "unsupported" in rows["m4"].err
    assert not rows["m5"].ok  # corrupt GIF fails its own row, nothing else


def test_image_features_resize_and_nonblank(spark):
    import numpy as np

    from morphik_core_spark.functions.image import encode_png

    px = np.zeros((20, 600, 3), dtype=np.uint8)
    px[:, ::2] = 255  # strong variation → not blank
    df = spark.createDataFrame([("m1", encode_png(px))], "media_id string, payload binary")
    row = extract_image_features(df).first()
    assert row.ok and (row.width, row.height) == (600, 20)  # original dims reported
    assert not row.is_blank


def test_attach_media_contract(spark):
    df = spark.createDataFrame([("m1", b"xyz")], "media_id string, payload binary")
    row = attach_media(df, "payload", "image", "image/png").first()
    assert (row.kind, row.mime, row.payload_bytes) == ("image", "image/png", 3)


def test_video_frame_sampling(spark):
    df = spark.createDataFrame([("v1", 3.5), ("v2", 0.2)], "media_id string, duration_s double")
    rows = sample_video_frames(df, frame_sample_rate=2.0).collect()
    v1 = sorted(r.frame_ts for r in rows if r.media_id == "v1")
    assert v1 == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0]  # floor(3.5*2)=7 frames
    assert len([r for r in rows if r.media_id == "v2"]) == 1  # at least one frame


def test_rag_assembly_citations_and_budget():
    rows = [
        {"document_id": "d1", "chunk_number": 0, "content": "alpha " * 10, "score": 0.9, "filename": "a.pdf"},
        {"document_id": "d2", "chunk_number": 3, "content": "beta " * 10, "score": 0.7},
    ]
    out = rag.rag_query(rows, "what is alpha?", rag.StubCompletionModel())
    assert out["citations"][0] == "[a.pdf p.1]"
    assert out["answer"].startswith("stub-answer [a.pdf p.1]")
    # char budget truncates whole chunks, keeps the best
    tight = rag.rag_query(rows, "q", rag.StubCompletionModel(), max_context_chars=80)
    assert "[a.pdf p.1]" in tight["context"] and "d2 p.4" not in tight["context"]


def test_rerank_hook_changes_order(spark):
    docs = spark.createDataFrame([("d1",), ("d2",)], "external_id string")
    chunks = spark.createDataFrame(
        [
            ("d1", 0, "nothing relevant here", [1.0, 0.0]),
            ("d2", 0, "the spark engine shuffles data", [0.9, 0.1]),
        ],
        "document_id string, chunk_number int, content string, embedding array<double>",
    )
    # cosine alone prefers d1 (query vec [1,0]); the overlap reranker must flip it
    plain = retrieve_chunks(docs, chunks, [1.0, 0.0], k=1, status_filter=None)
    assert plain.first().document_id == "d1"
    reranked = retrieve_chunks(
        docs, chunks, [1.0, 0.0], k=1, status_filter=None,
        reranker=make_reranker("spark engine shuffles"),
    )
    assert reranked.first().document_id == "d2"


def test_token_overlap_kernel():
    assert token_overlap_scores("a b", ["a b c", "x", ""]) == [1.0, 0.0, 0.0]


def test_pdf_page_image_extraction_pipeline(spark):
    import numpy as np

    from morphik_core_spark.functions.jpeg import encode_jpeg_baseline
    from morphik_core_spark.operators.multimodal import extract_pdf_page_images

    rng = np.random.default_rng(5)
    page = rng.integers(0, 256, size=(30, 20, 3), dtype=np.uint8)
    jpg = encode_jpeg_baseline(page)
    scanned = (
        b"%PDF-1.4\n<</Subtype /Image /Width 20 /Height 30 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceRGB /Filter /DCTDecode /Length "
        + str(len(jpg)).encode() + b">>\nstream\n" + jpg + b"\nendstream\n%%EOF"
    )
    textonly = b"%PDF-1.4\n<</Length 20>>\nstream\nBT (hi) Tj ET\nendstream\n%%EOF"
    empty = b"%PDF-1.4\n%%EOF"
    df = spark.createDataFrame(
        [("scan", bytearray(scanned)), ("text", bytearray(textonly)),
         ("empty", bytearray(empty)), ("bad", b"nope")],
        "media_id string, payload binary",
    )
    rows = {(r.media_id, r.page_idx): r for r in extract_pdf_page_images(df).collect()}
    assert rows[("scan", 0)].ok and rows[("scan", 0)].width == 20 and rows[("scan", 0)].height == 30
    # text-only PDFs now RASTERIZE (glyph-box renderer at DPI 150) instead
    # of vanishing: one real page bitmap, letter-sized, with ink -> not blank
    t = rows[("text", 0)]
    assert t.ok and t.width == round(612 * 150 / 72) and t.height == round(792 * 150 / 72)
    assert t.is_blank is False and t.mean_r < 255.0
    # a PDF with neither images nor pages stays visibly page-less
    assert rows[("empty", -1)].ok and rows[("empty", -1)].width is None
    assert not rows[("bad", -1)].ok


def test_visual_multivector_pipeline_end_to_end(spark):
    """Model-free visual retrieval: PDF pages -> patch multivectors ->
    MaxSim. A query rendered from the same text as page A must score A
    above a page with a different layout/content, and an identical-copy
    page ties A exactly."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from test_pdf import make_pdf_pages

    from morphik_core_spark.operators.maxsim import maxsim_pandas
    from morphik_core_spark.operators.multimodal import (
        page_patch_multivectors, text_query_multivector,
    )

    text_a = "quarterly revenue grew nine percent on cloud demand"
    ops_a = b"BT /F1 18 Tf 1 0 0 1 72 720 Tm (" + text_a.encode() + b") Tj ET"
    ops_b = b"BT /F1 10 Tf 1 0 0 1 300 200 Tm (unrelated tiny footnote) Tj ET"
    df = spark.createDataFrame(
        [("A", bytearray(make_pdf_pages([ops_a]))),
         ("Acopy", bytearray(make_pdf_pages([ops_a]))),
         ("B", bytearray(make_pdf_pages([ops_b]))),
         ("bad", b"not a pdf")],
        "media_id string, payload binary",
    )
    mv = page_patch_multivectors(df)
    rows = {r.media_id: r for r in mv.collect()}
    assert rows["A"].ok and len(rows["A"].multivector) == 16  # 4x4 grid
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-9 or all(x == 0 for x in v)
               for v in rows["A"].multivector)
    assert not rows["bad"].ok

    q = text_query_multivector(text_a)
    scored = {
        r.media_id: r.maxsim
        for r in maxsim_pandas(
            mv.filter("ok"), q, id_cols=("media_id", "page_idx")
        ).collect()
    }
    assert scored["A"] == scored["Acopy"]  # identical pages tie exactly
    assert scored["A"] > scored["B"]  # layout match beats mismatch


def test_scene_cut_detection(spark):
    import numpy as np

    from morphik_core_spark.functions.video import encode_avi_mjpeg
    from morphik_core_spark.operators.multimodal import detect_scene_cuts

    dark = np.full((16, 16, 3), 20, dtype=np.uint8)
    dark2 = np.full((16, 16, 3), 24, dtype=np.uint8)  # tiny drift: no cut
    bright = np.full((16, 16, 3), 220, dtype=np.uint8)  # hard cut
    avi = encode_avi_mjpeg([dark, dark2, bright, bright], fps=1.0)
    df = spark.createDataFrame(
        [("v1", bytearray(avi)), ("bad", bytearray(b"nope"))],
        "media_id string, payload binary",
    )
    rows = detect_scene_cuts(df, frame_sample_rate=1.0, cut_threshold=30.0).collect()
    v1 = sorted(
        [r for r in rows if r.media_id == "v1"], key=lambda r: r.frame_idx
    )
    assert [r.is_cut for r in v1] == [False, False, True, False]
    assert v1[0].diff is None  # first frame starts scene 0
    assert v1[2].diff > 150
    bad = [r for r in rows if r.media_id == "bad"][0]
    assert not bad.ok and bad.err


def test_audio_silence_segmentation(spark):
    import numpy as np

    from morphik_core_spark.functions.audio import encode_wav
    from morphik_core_spark.operators.multimodal import segment_audio

    rate = 8000

    def tone(sec):
        return 0.5 * np.sin(np.linspace(0, 2 * np.pi * 440 * sec, int(rate * sec)))

    speechy = np.concatenate([tone(1.0), np.zeros(int(rate * 0.5)), tone(0.7)])
    wav = encode_wav(speechy, rate)
    silent = encode_wav(np.zeros(rate), rate)
    df = spark.createDataFrame(
        [
            ("a", bytearray(wav)),
            ("quiet", bytearray(silent)),
            ("bad", bytearray(b"RIFFnope")),
        ],
        "media_id string, payload binary",
    )
    rows = segment_audio(df).collect()
    a = sorted([r for r in rows if r.media_id == "a"], key=lambda r: r.segment_idx)
    assert [(r.start_s, r.end_s) for r in a] == [(0.0, 1.0), (1.5, 2.2)]
    quiet = [r for r in rows if r.media_id == "quiet"][0]
    assert quiet.ok and quiet.segment_idx is None  # all-silence, not an error
    bad = [r for r in rows if r.media_id == "bad"][0]
    assert not bad.ok and bad.err
