"""Vector scalar functions — all built-in JVM expressions, no Python UDFs.

The hot-path scoring (`cosine → retrieval score`) mirrors the reference's
pgvector scan (`/root/reference/core/vector_store/pgvector_store.py:444-507`):
score = 1 − cosine_distance/2 = (1 + cosine_similarity)/2, range [0,1].

Implementation note for scale: ``F.aggregate(F.zip_with(...))`` compiles to
Catalyst higher-order functions executed inside codegen — the per-row cost
is a tight JVM loop over the array, no Arrow hop, no Python. For very wide
embeddings (≥ 2k dims) a pandas-UDF matmul over batched rows can beat it;
that variant lives in the similarity operator, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity", "retrieval_score"]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b); NULL when either vector is NULL or zero-norm."""
    denominator = l2_norm(a) * l2_norm(b)
    return F.when(denominator != 0.0, dot(a, b) / denominator)


def retrieval_score(a: Column, b: Column) -> Column:
    """Reference score normalization: 1 − cosine_distance/2 ∈ [0, 1]."""
    return (F.lit(1.0) + cosine_similarity(a, b)) / F.lit(2.0)
