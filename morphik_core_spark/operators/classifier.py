"""Classifier-based quality filtering — the learned half of corpus
curation (GPT-3 Appendix A and LLaMA train a quality classifier on a
positive corpus and filter/sample web data by its score; the reference's
rule-based filters live in operators/curation.py — this module adds the
trainable scorer those pipelines pair them with).

Design for determinism at cluster scale (the same discipline as
`graph.pagerank_fixed_point`):

- **Training is one aggregate per iteration.** Batch gradient descent:
  each round computes the full gradient with a single groupBy-less
  aggregation (map-side partial sums), the driver updates the weight
  vector, repeat. No mini-batches, no RNG, no per-partition state.
- **Order-free arithmetic.** Per-row gradient contributions are rounded
  to int64 MICRO-UNITS before summing, so the result is independent of
  partitioning and reduce order — bit-identical under local[1] and 1000
  executors, and twinnable in ANSI SQL (the oracle unrolls iterations as
  CTEs, exactly like the PageRank oracle).
- **No transcendental functions.** The link is the rational "fast
  sigmoid" s(z) = 0.5 + z / (2 * (1 + |z|)) — add/mul/div/abs are
  IEEE-correctly-rounded everywhere, unlike exp(), whose last-ulp
  differences across engines would poison value-level parity. s has the
  sigmoid shape (monotone, (0,1), s(0)=0.5) and trains fine with the
  logistic-style gradient (s(z) - y) * x.

Scale shape: training touches the corpus L times (L = iterations, single
digits) with one shuffle-free aggregate each; scoring is a pure map.
Feature extraction is plain codegen expressions over the text column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_features",
    "fast_sigmoid",
    "logreg_train",
    "logreg_score",
]

MICRO = 1_000_000


def quality_features(text: Column) -> list[Column]:
    """Fixed, SQL-twinnable feature vector for a document's text:
    [bias, capped length, capped word count, alpha ratio] — each in
    [0, 1], each a plain expression both engines evaluate identically.
    Deliberately simple: the POINT is the training/scoring machinery;
    richer features (stopword ratios, perplexity buckets, ...) plug in
    as extra columns with no change to the trainer."""
    n_chars = F.length(text).cast("double")
    words = F.size(F.split(text, " ")).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    return [
        F.lit(1.0),
        F.least(n_chars, F.lit(5000.0)) / F.lit(5000.0),
        F.least(words, F.lit(1000.0)) / F.lit(1000.0),
        alpha / F.greatest(n_chars, F.lit(1.0)),
    ]


def fast_sigmoid(z: Column) -> Column:
    """Rational sigmoid 0.5 + z / (2 * (1 + |z|)) — IEEE-exact on every
    engine (no exp), monotone, bounded in (0, 1)."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _dot(features: Sequence[Column], weights: Sequence[float]) -> Column:
    # explicit left-assoc sum: fixed IEEE evaluation order, same tree as
    # the SQL twin writes out
    acc = features[0] * F.lit(float(weights[0]))
    for f, w in zip(features[1:], weights[1:]):
        acc = acc + f * F.lit(float(w))
    return acc


def logreg_train(
    df: DataFrame,
    features: Sequence[Column],
    label: Column,
    iterations: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Batch-GD logistic-style training; returns the weight vector.

    Per iteration: ONE aggregation computing, per feature j,
    ``SUM(CAST(FLOOR((s(w·x) - y) * x_j * MICRO) AS BIGINT))`` and the
    row count; the driver applies the micro-unit update
    ``w_micro_j -= floor(lr * g_j / n)``. Every boundary operation is
    either exact int64 arithmetic or FLOOR of one IEEE division — both
    bit-identical on every engine (ROUND is not: Spark HALF_UP vs
    DuckDB/Python tie-breaking differs on exact halves, NOTES.md).
    Weights live as int64 micro-units; the doubles fed back into the
    next iteration's expressions are micro/1e6 — exact. O(iterations)
    passes, zero shuffles (global aggregate = map-side partials + one
    reduce). ``lr`` must be a small integer (micro-scaled update)."""
    lr_int = int(lr)
    if lr_int != lr or lr_int <= 0:
        raise ValueError("lr must be a positive integer (micro-unit update arithmetic)")
    w_micro = [0] * len(features)
    import math

    for _ in range(iterations):
        weights = [w / MICRO for w in w_micro]
        z = _dot(features, weights)
        err = fast_sigmoid(z) - label.cast("double")
        aggs = [
            F.floor(err * f * MICRO).cast("bigint").alias(f"_c{j}")
            for j, f in enumerate(features)
        ]
        grads = df.select(*aggs).agg(
            *[F.sum(f"_c{j}").alias(f"g{j}") for j in range(len(features))],
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = grads["n"]
        if not n:
            break
        w_micro = [
            w - math.floor(lr_int * grads[f"g{j}"] / n)
            for j, w in enumerate(w_micro)
        ]
    return [w / MICRO for w in w_micro]


def logreg_score(
    df: DataFrame,
    features: Sequence[Column],
    weights: Sequence[float],
    out_col: str = "quality_score",
    decimals: int = 6,
) -> DataFrame:
    """Pure-map scoring: s(w·x), rounded for cross-engine parity."""
    return df.withColumn(out_col, F.round(fast_sigmoid(_dot(features, weights)), decimals))
