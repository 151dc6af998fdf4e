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

    Implementation is a bounded-``k`` driver loop of PURE DataFrame
    ops — no Python kernel: each round anti-joins the already-selected
    rows, joins the ≤ round-count selected vectors back on the query
    key, takes the max per-candidate cosine (each cosine ROUNDed once),
    and picks the arg-max objective with a row_number window
    partitioned by query. Every float the selection compares is one
    fixed expression tree rounded once, with the id as tiebreak, so
    the chosen set is engine- and partitioning-independent.

    Scale: the loop runs k times (k ≤ 10 in practice) over a frame of
    N_queries × C candidates where C is the bounded ANN fan-in (≤ a few
    hundred); all joins are equi-joins on the query key, so with both
    sides hash-partitioned on it no round shuffles more than the
    candidate frame. Window partitions are per-query (≤ C rows).

    Output: (query, rank 1..k, id, score, mmr_score); rank 1's
    mmr_score is its relevance score (empty selected set ⇒ no
    redundancy term, the standard convention).
    """
    from pyspark.sql import Window

    from morphik_core_spark.functions.vectors import cosine_similarity

    q, i, s, v = query_col, id_col, score_col, vec_col
    cands = candidates.select(
        F.col(q).alias("_q"),
        F.col(i).alias("_id"),
        F.round(F.col(s).cast("double"), decimals).alias("_score"),
        F.col(v).alias("_vec"),
    )
    # The greedy loop references this frame 2(k−1)+1 times; without a
    # lineage cut every reference recomputes the upstream ANN scoring
    # scan (measured 2.4 s → sub-second at sf0.1). The frame is bounded
    # by contract (n_queries × fan-in), so an eager localCheckpoint is
    # cheap — the same per-round pattern as dedup's connected components.
    cands = cands.localCheckpoint(eager=True)
    w = Window.partitionBy("_q")
    first = (
        cands.withColumn(
            "rn", F.row_number().over(w.orderBy(F.col("_score").desc(), F.col("_id").asc()))
        )
        .filter(F.col("rn") == 1)
        .select("_q", F.lit(1).alias("rank"), "_id", "_score",
                F.col("_score").alias("_mmr"), "_vec")
    )
    selected = first
    for step in range(2, k + 1):
        remaining = cands.join(
            selected.select("_q", "_id"), ["_q", "_id"], "left_anti"
        )
        objective = (
            remaining.join(
                selected.select("_q", F.col("_vec").alias("_svec")), "_q"
            )
            .groupBy("_q", "_id")
            .agg(
                F.first("_score").alias("_score"),
                F.first("_vec").alias("_vec"),
                F.max(
                    F.round(cosine_similarity(F.col("_vec"), F.col("_svec")), decimals)
                ).alias("_maxsim"),
            )
            .withColumn(
                "_mmr",
                F.round(
                    F.lit(float(lam)) * F.col("_score")
                    - F.lit(1.0 - float(lam)) * F.col("_maxsim"),
                    decimals,
                ),
            )
        )
        pick = (
            objective.withColumn(
                "rn", F.row_number().over(w.orderBy(F.col("_mmr").desc(), F.col("_id").asc()))
            )
            .filter(F.col("rn") == 1)
            .select("_q", F.lit(step).alias("rank"), "_id", "_score", "_mmr", "_vec")
        )
        selected = selected.unionByName(pick)
    return selected.select(
        F.col("_q").alias(q),
        "rank",
        F.col("_id").alias(i),
        F.col("_score").alias(s),
        F.col("_mmr").alias("mmr_score"),
    )
