"""Visual (ColPali-shaped) retrieval quality — the model-free patch path.

The reference's visual path embeds rendered pages with ColPali and ranks
by MaxSim; no model lives in this container, so the engine ships a
deterministic patch kernel (operators/multimodal.page_patch_multivectors:
glyph-box page raster → 4×4 patch grid → L2-normalized ink vectors) and
renders the QUERY through the same kernel. Glyph boxes carry no glyph
IDENTITY, so this space matches LAYOUT, not words — the honest model-free
capabilities are query-by-visual-example and visual near-dup detection
(the reference's `query_image` path), NOT text-to-page retrieval (that
needs a real ColPali through model_adapters, same schema). This harness
measures exactly that: build N one-page PDFs with distinct layouts,
query each with a PERTURBED re-render of itself (+8pt y, +2pt font — a
"photocopy" of the page), and report top-1 accuracy + MRR of MaxSim
ranking; plus a layout-sensitivity probe (same text moved far away must
score below the original placement) and a text-query floor showing why
content queries need the model (documented, not hidden).

Run: python evaluations/visual_retrieval_eval.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

N_DOCS = 24
WORDS = (
    "revenue growth cloud margin outlook guidance churn retention pipeline "
    "bookings capex hiring latency uptime incident roadmap launch pricing "
    "discount renewal expansion usage adoption benchmark"
).split()


def _doc_layout(i: int) -> tuple[int, int, int, int]:
    """Unique per-doc layout signature: (x, y, size, n_lines). Distinct
    for every i < N_DOCS, so pages are visually distinguishable — the
    eval measures ranking quality, not structural-tie luck."""
    return (72 + (i * 37) % 240, 720 - (i * 29) % 480, 10 + (i % 5) * 3, 1 + i % 4)


def make_docs() -> list[tuple[str, str, bytes]]:
    from test_pdf import make_pdf_pages

    docs = []
    for i in range(N_DOCS):
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(6))
        x, y, size, n_lines = _doc_layout(i)
        ops = [b"BT /F1 %d Tf" % size]
        for ln in range(n_lines):
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y - ln * size * 2, text.encode()))
        ops.append(b"ET")
        docs.append((f"d{i}", text, make_pdf_pages([b" ".join(ops)])))
    return docs


def main() -> None:
    from morphik_core_spark.operators.maxsim import maxsim_pandas
    from morphik_core_spark.operators.multimodal import (
        page_patch_multivectors,
        text_query_multivector,
    )
    from morphik_core_spark.session import get_spark

    spark = get_spark(app_name="visual_retrieval_eval")
    docs = make_docs()
    df = spark.createDataFrame(
        [(d, bytearray(pdf)) for d, _t, pdf in docs], "media_id string, payload binary"
    )
    grids = [4, 8]
    mvs = {g: page_patch_multivectors(df, grid=g).filter("ok").cache() for g in grids}
    for m in mvs.values():
        m.count()
    mv = mvs[4]

    from test_pdf import make_pdf_pages as _mk

    from morphik_core_spark.operators.multimodal import _pool_page_patches
    from morphik_core_spark.functions.pdf_render import rasterize_pdf_pages

    hits1_by_grid = {g: 0 for g in grids}
    rr_by_grid = {g: 0.0 for g in grids}
    text_rr = 0.0
    for i, (doc_id, text, _pdf) in enumerate(docs):
        # query-by-visual-example: a perturbed re-render of the page
        x, y, size, n_lines = _doc_layout(i)
        x, y, size = x + 5, y + 8, size + 1
        ops = [b"BT /F1 %d Tf" % size]
        for ln in range(n_lines):
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y - ln * size * 2, text.encode()))
        ops.append(b"ET")
        (gray,) = rasterize_pdf_pages(_mk([b" ".join(ops)]), dpi=54)
        for g in grids:
            q = _pool_page_patches(gray, g, 4)
            ranked = (
                maxsim_pandas(mvs[g], q, id_cols=("media_id", "page_idx"))
                .orderBy("maxsim", ascending=False)
                .select("media_id")
                .collect()
            )
            order = [r.media_id for r in ranked]
            rank = order.index(doc_id) + 1
            hits1_by_grid[g] += rank == 1
            rr_by_grid[g] += 1.0 / rank
        # the text-query floor: rendered text at a FIXED position cannot
        # recover the doc's layout — reported so the boundary is visible
        qt = text_query_multivector(text)
        rt = [
            r.media_id
            for r in maxsim_pandas(mv, qt, id_cols=("media_id", "page_idx"))
            .orderBy("maxsim", ascending=False)
            .select("media_id")
            .collect()
        ]
        text_rr += 1.0 / (rt.index(doc_id) + 1)

    # layout sensitivity: same text, different position, must score lower
    from test_pdf import make_pdf_pages

    text = docs[0][1]
    moved = make_pdf_pages([b"BT /F1 12 Tf 1 0 0 1 300 150 Tm (" + text.encode() + b") Tj ET"])
    pair = spark.createDataFrame(
        [("orig", bytearray(docs[0][2])), ("moved", bytearray(moved))],
        "media_id string, payload binary",
    )
    q = text_query_multivector(text)
    scores = {
        r.media_id: r.maxsim
        for r in maxsim_pandas(
            page_patch_multivectors(pair).filter("ok"), q, id_cols=("media_id", "page_idx")
        ).collect()
    }
    print(
        json.dumps(
            {
                "metric": "visual_retrieval",
                "n_docs": N_DOCS,
                "top1_acc_by_grid": {g: round(hits1_by_grid[g] / N_DOCS, 4) for g in grids},
                "mrr_by_grid": {g: round(rr_by_grid[g] / N_DOCS, 4) for g in grids},
                "text_query_mrr_floor": round(text_rr / N_DOCS, 4),
                "layout_sensitive": scores["orig"] > scores["moved"],
            }
        )
    )


if __name__ == "__main__":
    main()
