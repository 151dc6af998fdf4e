"""Similarity search over embedding columns.

Brute-force exact top-k is the correctness baseline (and is genuinely the
right plan when the query batch is small: one scan, per-partition heaps,
no index to build). The scale path is sign-LSH bucketing: hash vectors to
buckets with fixed hyperplanes, search only the query's bucket — turning
top-k into a partition-pruned scan. Both are pure DataFrame ops.

At real 100 TB/billion-vector scale the bucketed table is written
partitioned by ``bucket`` so probes prune at the file level; multi-probe
(flip lowest-margin bits) trades recall for scan breadth the same way
ivfflat's ``probes`` knob does in the reference
(/root/reference/core/vector_store/pgvector_store.py:125).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from morphik_core_spark.functions.vectors import dot, retrieval_score

__all__ = ["knn_brute_force", "lsh_bucket", "probe_buckets", "knn_lsh"]


def knn_brute_force(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "q_id",
    q_emb_col: str = "qv",
    decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k per query: broadcast the query batch, score every vector,
    keep k per query via a window rank (one shuffle keyed on q_id).

    Output: (q_id, vec_id, score) — score is the reference retrieval score.
    """
    scored = embeddings.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        retrieval_score(F.col(emb_col).cast("array<double>"), F.col(q_emb_col)).alias("score"),
    )
    if decimals is not None:
        scored = scored.withColumn("score", F.round("score", decimals))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_bucket(emb: Column, hyperplanes: Sequence[Sequence[float]]) -> Column:
    """Sign-LSH bucket id: bit b set iff dot(v, hyperplane_b) > 0."""
    acc = F.lit(0).cast("bigint")
    for b, hp in enumerate(hyperplanes):
        hp_lit = F.lit([float(x) for x in hp]).cast("array<double>")
        bit = F.when(dot(emb.cast("array<double>"), hp_lit) > 0.0, F.lit(1 << b)).otherwise(F.lit(0))
        acc = acc + bit.cast("bigint")
    return acc


def probe_buckets(emb: Column, hyperplanes: Sequence[Sequence[float]], n_probes: int) -> Column:
    """Multi-probe bucket list: the vector's own bucket plus single-bit
    flips of the ``n_probes - 1`` lowest-|margin| hyperplanes — the bits
    most likely to be on the wrong side of a noisy boundary. This is the
    ivfflat ``probes`` knob (reference pgvector_store.py:125) for sign-LSH:
    recall rises with probe count, scan breadth rises linearly, and every
    probe is still a partition-prunable bucket id.
    """
    v = emb.cast("array<double>")
    main = lsh_bucket(emb, hyperplanes)
    margins = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(dot(v, F.lit([float(x) for x in hp]).cast("array<double>"))).alias("m"), F.lit(b).alias("b"))
                for b, hp in enumerate(hyperplanes)
            ]
        )
    )
    flips = F.transform(
        F.slice(margins, 1, n_probes - 1),
        # 2^b via pow: exact in double up to 2^52, far beyond any plane count
        lambda s: main.bitwiseXOR(F.pow(F.lit(2.0), s["b"]).cast("bigint")),
    )
    return F.concat(F.array(main), flips)


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    hyperplanes: Sequence[Sequence[float]],
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "q_id",
    q_emb_col: str = "qv",
    decimals: int | None = 6,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).

    The bucket equi-join replaces the cross join — candidate count drops
    ~2^bits-fold; recall follows the standard sign-LSH tradeoff.
    ``n_probes > 1`` additionally probes the buckets reached by flipping
    the lowest-margin hyperplane bits (see :func:`probe_buckets`); each
    data vector still lives in exactly one bucket, and probe buckets are
    distinct, so candidates never duplicate.
    """
    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col(emb_col), hyperplanes))
    if n_probes <= 1:
        q_bucketed = queries.withColumn("bucket", lsh_bucket(F.col(q_emb_col), hyperplanes))
    else:
        q_bucketed = queries.withColumn(
            "bucket", F.explode(probe_buckets(F.col(q_emb_col), hyperplanes, n_probes))
        )
    scored = bucketed.join(F.broadcast(q_bucketed), "bucket").select(
        F.col(q_id_col),
        F.col(id_col),
        retrieval_score(F.col(emb_col).cast("array<double>"), F.col(q_emb_col)).alias("score"),
    )
    if decimals is not None:
        scored = scored.withColumn("score", F.round("score", decimals))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
