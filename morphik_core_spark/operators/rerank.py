"""Cross-encoder rerank hook (reference flag_reranker.py:30-60,
document_service.py:386-466).

The real cross-encoder (BGE reranker) is an external model — not in this
container — so the scoring kernel is pluggable: any
``(query, contents) → scores`` callable. The Spark side is real: an
Arrow-batched pandas UDF rescoring the oversampled candidate set
(max(k, min(3k, 20)) rows, see retrieval.rerank_oversample_size), then
re-sort and cut to k. The default kernel is a deterministic token-overlap
scorer, which doubles as the test double.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_overlap_scores", "make_reranker"]


def token_overlap_scores(query: str, contents: Sequence[str]) -> list[float]:
    """Deterministic stand-in kernel: |query ∩ content| / |query| tokens."""
    q = set(query.lower().split())
    out = []
    for c in contents:
        toks = set((c or "").lower().split())
        out.append(len(q & toks) / max(len(q), 1))
    return out


def make_reranker(
    query: str,
    kernel: Callable[[str, Sequence[str]], list[float]] = token_overlap_scores,
    content_col: str = "content",
):
    """Build a reranker for retrieval.retrieve_chunks(reranker=...):
    DataFrame → DataFrame with ``score`` replaced by the kernel's score."""

    @F.pandas_udf("double")
    def rescore(contents: pd.Series) -> pd.Series:
        return pd.Series(kernel(query, contents.tolist()))

    def rerank(df: DataFrame) -> DataFrame:
        return df.withColumn("score", rescore(F.col(content_col)))

    return rerank
