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

__all__ = ["token_overlap_scores", "make_reranker", "mmr_diversify"]


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


def mmr_diversify(
    candidates: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    vec_col: str,
    lam: float = 0.5,
    k: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of an ANN candidate set: greedily pick ``k`` results per query that
    trade relevance against redundancy,

        mmr(c) = λ·score(c) − (1−λ)·max_{s∈selected} cos(c, s)

    — the diversity pass a RAG retriever runs between vector top-k and
    prompt assembly (the reference returns raw top-k,
    `core/services/document_service.py:386-466`; this extends it).

    The whole greedy selection runs INSIDE codegen as one fold per query
    (round-11 rewrite of the former bounded-``k`` driver loop of
    anti-join/join/window rounds — 42 Exchanges of ≤ C-row frames plus an
    eager localCheckpoint action, all pure stage-scheduling overhead):
    candidates are gathered into one array row per query, and an
    ``aggregate`` over ``sequence(2, k)`` repeatedly scores the remaining
    candidates (max per-candidate cosine to the picked set, each cosine
    ROUNDed once) and appends the arg-max pick via an ``array_sort``
    comparator. Every float compared is the SAME fixed expression tree as
    the join form — dot/norm via aggregate(zip_with(...)), one ROUND per
    cosine, one ROUND per objective, id tiebreaks, NULLs (zero-norm
    vectors) last — so the chosen set is bit-identical to the former
    implementation and engine-/partitioning-independent.

    Scale: one shuffle (groupBy query); each per-query row is bounded by
    the ANN fan-in C (≤ a few hundred), so the fold is O(k·C) small-array
    work in a tight JVM loop — no joins, no windows, no driver actions.

    Output: (query, rank 1..k, id, score, mmr_score); rank 1's
    mmr_score is its relevance score (empty selected set ⇒ no
    redundancy term, the standard convention). If a query has fewer than
    ``k`` candidates every candidate is ranked, as before.
    """
    q, i, s, v = query_col, id_col, score_col, vec_col
    cs = (
        candidates.select(
            F.col(q).alias("_q"),
            F.col(i).alias("_id"),
            F.round(F.col(s).cast("double"), decimals).alias("_score"),
            F.col(v).alias("_vec"),
        )
        .groupBy("_q")
        .agg(F.collect_list(F.struct("_id", "_score", "_vec")).alias("cs"))
    )

    lam_lit = f"CAST({float(lam)!r} AS DOUBLE)"
    one_minus_lam_lit = f"CAST({1.0 - float(lam)!r} AS DOUBLE)"

    def _dot(a: str, b: str, t: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x{t}, y{t}) -> x{t} * y{t}), "
            f"0D, (a{t}, b{t}) -> a{t} + b{t})"
        )

    # cosine_similarity(c._vec, s._vec) verbatim: NULL when zero-norm
    _den = f"(sqrt({_dot('c._vec', 'c._vec', '1')}) * sqrt({_dot('s._vec', 's._vec', '2')}))"
    _cos = f"CASE WHEN {_den} != CAST(0.0 AS DOUBLE) THEN {_dot('c._vec', 's._vec', '3')} / {_den} END"

    def _cmp(key: str) -> str:
        # (key DESC NULLS LAST, _id ASC) — row_number's ordering
        return (
            f"(l, r) -> CASE "
            f"WHEN l.{key} IS NULL AND r.{key} IS NULL THEN "
            f"  CASE WHEN l._id < r._id THEN -1 WHEN l._id > r._id THEN 1 ELSE 0 END "
            f"WHEN l.{key} IS NULL THEN 1 "
            f"WHEN r.{key} IS NULL THEN -1 "
            f"WHEN l.{key} > r.{key} THEN -1 "
            f"WHEN l.{key} < r.{key} THEN 1 "
            f"ELSE CASE WHEN l._id < r._id THEN -1 WHEN l._id > r._id THEN 1 ELSE 0 END END"
        )

    # rank 1: arg-max relevance; _mmr is the score itself
    init = (
        f"transform(slice(array_sort(cs, {_cmp('_score')}), 1, 1), "
        f"b -> named_struct('_id', b._id, '_score', b._score, '_mmr', b._score, '_vec', b._vec))"
    )
    # each step: score the not-yet-picked candidates against the picked
    # set st, then append the arg-max objective (slice keeps the step a
    # no-op when the query has fewer than k candidates)
    scored = (
        "transform(filter(cs, c -> NOT exists(st, e -> e._id <=> c._id)), "
        "c -> named_struct("
        "'_id', c._id, "
        "'_score', c._score, "
        f"'_mmr', round({lam_lit} * c._score - {one_minus_lam_lit} * "
        f"array_max(transform(st, s -> round({_cos}, {int(decimals)}))), {int(decimals)}), "
        "'_vec', c._vec))"
    )
    sel = init
    if int(k) > 1:
        sel = (
            f"aggregate(sequence(2, {int(k)}), {init}, "
            f"(st, step) -> concat(st, slice(array_sort({scored}, {_cmp('_mmr')}), 1, 1)))"
        )
    return (
        cs.select("_q", F.posexplode(F.expr(sel)).alias("pos", "p"))
        .select(
            F.col("_q").alias(q),
            (F.col("pos") + F.lit(1)).alias("rank"),
            F.col("p._id").alias(i),
            F.col("p._score").alias(s),
            F.col("p._mmr").alias("mmr_score"),
        )
    )
