"""Embedding-matrix statistics: exact distributed covariance and PCA.

The preprocessing stage in front of large-scale ANN / semantic-dedup
pipelines (FAISS's OPQ/PCA pretransforms, SemDeDup-style whitening):
estimate the embedding covariance over the full corpus, eigendecompose
once on the driver, and project every vector — mean-centering + rotation
as a pure map.

Design for exactness AND scale:

- The corpus-wide pass computes INTEGER moments: each component is
  quantized to q = floor(x * 2^scale_bits) (floor of the same double on
  every engine — exact), and all sums run in int64. With |x| <= ~32,
  scale_bits=10 and up to ~2^39 rows the Gram sums stay inside int64 —
  order- and partitioning-independent, so the result is bit-identical on
  any cluster layout (the same trick as the fixed-point PageRank).
- The serving kernel is one ``mapInPandas`` pass emitting per-batch
  partial Gram matrices via a single int64 ``Q.T @ Q`` matmul (dims^2
  numbers per batch, NOT per row), reduced by one tiny groupBy — the
  classic map-side-combine covariance. The relational pair-explode twin
  (dims^2 rows per vector) exists for the oracle only.
- Covariance / eigh / projection happen on dims x dims numbers — driver
  scale, the same offline-trainer boundary as
  :func:`~morphik_core_spark.operators.similarity.kmeans_fit` for IVF.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "covariance_sums",
    "pca_fit",
    "pca_project",
    "simplified_silhouette",
    "label_centroids",
    "centroid_confusion",
    "embedding_drift",
]


def _moment_sums(embeddings: DataFrame, dims: int, scale_bits: int, emb_col: str) -> DataFrame:
    """One-pass exact integer moments: rows (i, j, s) with j >= i holding
    the second-moment sums SUM(q_i*q_j) and j = -1 rows holding the first
    moments SUM(q_i). Per-batch partials come from one int64 matmul."""
    mul = float(1 << scale_bits)

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(dims)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            q = np.floor(x * mul).astype(np.int64)
            g = q.T @ q
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu[0], np.arange(dims)]).astype(np.int32),
                    "j": np.concatenate([iu[1], np.full(dims, -1)]).astype(np.int32),
                    "s": np.concatenate([g[iu], q.sum(axis=0)]),
                }
            )

    partials = embeddings.select(emb_col).mapInPandas(gram, "i int, j int, s bigint")
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_sums(
    embeddings: DataFrame,
    dims: int,
    scale_bits: int = 10,
    emb_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Exact int-space covariance statistics over an embedding column.

    Output: one row per ordered pair i <= j (0-based dims):
    ``(i, j, sij, cov)`` where ``sij = SUM(q_i * q_j)`` over all vectors
    (int64-exact) and ``cov`` is the sample covariance of the QUANTIZED
    components, ``(sij - si*sj/n) / (n-1)``, rounded to ``decimals`` —
    one fixed double tree over integer inputs, engine- and
    partitioning-exact.

    Plan: one mapInPandas scan emits per-batch partial sums, a single
    groupBy (i, j) reduces dims*(dims+3)/2 keys — shuffle bytes are
    O(batches * dims^2), independent of row count.
    """
    sums = _moment_sums(embeddings, dims, scale_bits, emb_col)
    n_row = embeddings.agg(F.count(F.lit(1)).alias("n"))
    firsts = sums.filter(F.col("j") == -1).select(F.col("i").alias("d"), F.col("s").alias("sd"))
    pairs = sums.filter(F.col("j") >= 0).withColumnRenamed("s", "sij")
    cov = (
        F.col("sij").cast("double")
        - F.col("si").cast("double") * F.col("sj").cast("double") / F.col("n").cast("double")
    ) / (F.col("n").cast("double") - F.lit(1.0))
    return (
        pairs.join(F.broadcast(firsts.select(F.col("d").alias("i"), F.col("sd").alias("si"))), "i")
        .join(F.broadcast(firsts.select(F.col("d").alias("j"), F.col("sd").alias("sj"))), "j")
        .crossJoin(F.broadcast(n_row))
        .select("i", "j", "sij", F.round(cov, decimals).alias("cov"))
    )


def pca_fit(
    embeddings: DataFrame,
    dims: int,
    scale_bits: int = 10,
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA from the exact integer sums: returns (mean, components,
    explained_variance) in the ORIGINAL (unquantized) coordinate scale.

    Only dims*(dims+3)/2 numbers reach the driver; eigh on the
    dims x dims matrix is driver-scale by design. components[k] is the
    k-th principal axis; rows are ordered by descending eigenvalue with a
    deterministic sign convention (largest-|coord| entry positive), so
    the fit is reproducible across runs and cluster layouts.
    """
    mul = float(1 << scale_bits)
    rows = _moment_sums(embeddings, dims, scale_bits, emb_col).collect()
    n = embeddings.count()
    s1 = np.zeros(dims, dtype=np.float64)
    s2 = np.zeros((dims, dims), dtype=np.float64)
    for r in rows:
        if r.j == -1:
            s1[r.i] = float(r.s)
        else:
            s2[r.i, r.j] = s2[r.j, r.i] = float(r.s)
    cov_q = (s2 - np.outer(s1, s1) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov_q)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order].T
    for k in range(dims):
        m = int(np.argmax(np.abs(evecs[k])))
        if evecs[k, m] < 0:
            evecs[k] = -evecs[k]
    mean = s1 / (n * mul)
    return mean, evecs, evals / (mul * mul)


def pca_project(
    embeddings: DataFrame,
    mean: Sequence[float],
    components: np.ndarray,
    n_components: int,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the top ``n_components`` axes — a pure map
    (mean-center + rotate) expressed as codegen array math against
    literal component vectors: no UDF, no shuffle, scales as a scan.
    """
    mean_lit = F.lit([float(x) for x in mean]).cast("array<double>")
    centered = F.zip_with(F.col(emb_col).cast("array<double>"), mean_lit, lambda a, b: a - b)
    outs = []
    for k in range(n_components):
        comp = F.lit([float(x) for x in components[k]]).cast("array<double>")
        outs.append(
            F.aggregate(
                F.zip_with(centered, comp, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return embeddings.withColumn(out_col, F.array(*outs))


def label_centroids(
    embeddings: DataFrame,
    dims: int,
    group_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Per-group exact centroid (class prototype): per-dimension mean
    computed from scaled-integer sums — each component quantizes to
    round(x·10⁷) int64 before the group SUM, so the centroid is
    partitioning-independent to the last bit (the covariance/PageRank
    scaled-int rule; |x| ≤ ~90 keeps 10⁷-scaled sums inside int64 up to
    ~10⁹ rows per group). The prototype table behind nearest-centroid
    audits, cluster naming, and class-balance drift checks.

    Output: (group, n_vecs, centroid array<double>), each dim ROUND(6)
    (+0.0 collapses −0.0 so reprs agree across engines).

    Scale: one map + one groupBy producing |groups| rows of dims
    numbers — broadcastable downstream like IVF centroids.
    """
    # one parsed SQL string per aggregate and ONE for the centroid array:
    # the Column-API form (64 nested F.sum/F.round/F.cast chains) cost
    # ~1.6 s of py4j/analysis per call (the F.expr-vs-py4j-literals
    # lesson, NOTES.md round 4)
    sums = embeddings.groupBy(group_col).agg(
        F.expr("count(1) AS n_vecs"),
        *[
            F.expr(
                f"SUM(CAST(round(CAST(`{emb_col}`[{i}] AS DOUBLE) * 10000000.0D) AS BIGINT)) AS _s{i}"
            )
            for i in range(dims)
        ],
    )
    cent = ", ".join(
        f"round(CAST(_s{i} AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 10000000.0D, {decimals}) + 0.0D"
        for i in range(dims)
    )
    return sums.selectExpr(f"`{group_col}`", "n_vecs", f"array({cent}) AS centroid")


def centroid_confusion(
    embeddings: DataFrame,
    dims: int,
    group_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Nearest-centroid confusion matrix: assign every vector to its
    cosine-nearest class centroid (from :func:`label_centroids`) and
    count (true group → assigned group) pairs — the label-quality /
    class-separability audit run before trusting labels for training
    (high off-diagonal mass = mislabeled or inseparable classes).

    Determinism: cosine is rounded BEFORE the argmax and ties break to
    the smallest centroid id via one struct-min aggregation (the same
    rounded-argmax rule as `ivf_assign`); centroid values are the
    exact scaled-int means, identical on any engine.

    Scale: the centroid frame is |groups|·dims numbers — broadcast; one
    nested-loop broadcast join (sanctioned sketch-size pattern), one
    struct-min groupBy per vector, one tiny confusion groupBy.
    """
    # dots as EXPLICIT indexed sums, not zip_with/aggregate folds: the
    # higher-order functions interpret per element (~1.7 µs/elem measured
    # — 2.2 s for 2k vectors × 10 centroids × 64 dims) while the explicit
    # chain stays inside whole-stage codegen; same left-associated
    # doubles (0-init fold ≡ bare chain). Norms are hoisted out of the
    # per-(vector, centroid) expression: once per centroid row, once per
    # vector row — the pair expression multiplies only the cross dot.
    def xdot(a, b) -> str:
        return " + ".join(f"({a(i)} * {b(i)})" for i in range(dims))

    ve = lambda i: f"CAST(`{emb_col}`[{i}] AS DOUBLE)"
    ce = lambda i: f"centroid[{i}]"
    cents = label_centroids(embeddings, dims, group_col, emb_col, id_col, decimals).select(
        F.col(group_col).alias("cid"),
        "centroid",
        F.expr(f"sqrt({xdot(ce, ce)})").alias("_cnorm"),
    )
    vecs = embeddings.withColumn("_vnorm", F.expr(f"sqrt({xdot(ve, ve)})"))
    cos = f"({xdot(ve, ce)}) / (_vnorm * _cnorm)"
    joined = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "_nc", -F.round(F.expr(cos), decimals)
    )
    best = joined.groupBy(id_col, group_col).agg(
        F.min(F.struct(F.col("_nc"), F.col("cid"))).alias("_b")
    )
    return best.groupBy(
        F.col(group_col).alias("true_label"), F.col("_b.cid").alias("assigned_label")
    ).agg(F.count(F.lit(1)).alias("n_vecs"))


def simplified_silhouette(
    embeddings: DataFrame,
    dims: int,
    group_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale_bits: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster: for each
    vector, a = Euclidean distance to its OWN cluster centroid, b = the
    nearest OTHER centroid, s = (b−a)/max(a,b) — the cluster-quality
    scalar `centroid_confusion`'s assignment counts stop short of
    (confusion says WHERE vectors fall; silhouette says how cleanly).
    The classical silhouette's all-pairs a(i)/b(i) is O(n²) and
    unusable at corpus scale; the centroid form is the standard O(n·k)
    restatement and upper-bounds cohesion the same way IVF assignment
    does.

    Exactness: components quantize to round(x·2^scale_bits) int64 once;
    per-(group, dim) sums are exact; each centroid component re-
    quantizes to the 2^(2·scale_bits) grid (one double division +
    round), so every squared distance is an EXACT int64 (terms ≤
    (2·2^20)²·dims ≪ 2⁶³) — sqrt and the s ratio are the only floats,
    one fixed tree per (vector, centroid), s ROUND(·1e6)-quantized
    before the per-cluster mean.

    Scale: one groupBy for centroids (|groups|·dims numbers →
    broadcast), one nested-loop broadcast join vector×centroids (the
    sanctioned sketch-size pattern `centroid_confusion` uses), one
    min-pair aggregate per vector, one |groups|-row rollup.

    Output per cluster: (group, n_vecs, mean_silhouette), ordered.
    """
    mul = float(1 << scale_bits)
    sums = embeddings.groupBy(group_col).agg(
        F.expr("count(1) AS _n"),
        *[
            F.expr(
                f"SUM(CAST(round(CAST(`{emb_col}`[{i}] AS DOUBLE) * {mul!r}D) AS BIGINT)) AS _s{i}"
            )
            for i in range(dims)
        ],
    )
    cent = sums.selectExpr(
        f"`{group_col}` AS _cg",
        *[
            f"CAST(round(CAST(_s{i} AS DOUBLE) * {mul!r}D / CAST(_n AS DOUBLE)) AS BIGINT) AS _c{i}"
            for i in range(dims)
        ],
    )
    vec = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        *[
            F.expr(
                f"CAST(round(CAST(`{emb_col}`[{i}] AS DOUBLE) * {mul!r}D) AS BIGINT) AS _x{i}"
            )
            for i in range(dims)
        ],
    )
    scale_i = 1 << scale_bits
    d2 = " + ".join(
        f"(({scale_i} * _x{i} - _c{i}) * ({scale_i} * _x{i} - _c{i}))" for i in range(dims)
    )
    pairs = vec.join(F.broadcast(cent)).selectExpr(
        "_id", "_g", "_cg", f"({d2}) AS _d2"
    )
    per_vec = pairs.groupBy("_id", "_g").agg(
        F.min(F.when(F.col("_cg") == F.col("_g"), F.col("_d2"))).alias("_a2"),
        F.min(F.when(F.col("_cg") != F.col("_g"), F.col("_d2"))).alias("_b2"),
    )
    s_u = (
        "CAST(ROUND(CASE WHEN greatest(sqrt(CAST(_a2 AS DOUBLE)), sqrt(CAST(_b2 AS DOUBLE))) = 0.0 THEN 0.0 "
        "ELSE (sqrt(CAST(_b2 AS DOUBLE)) - sqrt(CAST(_a2 AS DOUBLE))) / "
        "greatest(sqrt(CAST(_a2 AS DOUBLE)), sqrt(CAST(_b2 AS DOUBLE))) END * 1e6) AS BIGINT)"
    )
    return (
        per_vec.selectExpr("_g", f"{s_u} AS _su")
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("_su").alias("_ss"))
        .select(
            F.col("_g").alias(group_col),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.round(
                F.expr("CAST(_ss AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1e6"), decimals
            ).alias("mean_silhouette"),
        )
        .orderBy(group_col)
    )


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    dims: int,
    group_col: str = "label",
    emb_col: str = "embedding",
    scale_bits: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Per-group embedding drift between two snapshots: the Euclidean
    distance between each group's exact integer centroids — the
    embedding-space twin of `vocab_drift`'s term-distribution shift and
    the monitor a retrain pipeline runs when the embedder (or the
    corpus) changes under a standing index. A group whose prototype
    moved re-ranks every cached kNN against it; this is the number that
    says which labels those are.

    Same exactness recipe as `simplified_silhouette`: components
    quantize once to round(x·2^scale_bits) int64, per-(group, dim) sums
    are exact, centroids re-quantize to the 2^(2·scale_bits) grid, so
    the squared shift is an exact int64 and sqrt is the only float.
    Groups missing on either side emit NULL shift (full-outer join on
    the group).

    Output: (group, n_a, n_b, centroid_shift), ordered.

    Scale: one groupBy per side producing |groups|·dims numbers; the
    join is groups-sized.
    """
    mul = float(1 << scale_bits)
    scale2 = float(1 << (2 * scale_bits))

    def cent(df, tag):
        sums = df.groupBy(group_col).agg(
            F.expr(f"count(1) AS _n_{tag}"),
            *[
                F.expr(
                    f"SUM(CAST(round(CAST(`{emb_col}`[{i}] AS DOUBLE) * {mul!r}D) AS BIGINT)) AS _s{i}"
                )
                for i in range(dims)
            ],
        )
        return sums.selectExpr(
            f"`{group_col}`",
            f"_n_{tag}",
            *[
                f"CAST(round(CAST(_s{i} AS DOUBLE) * {mul!r}D / CAST(_n_{tag} AS DOUBLE)) AS BIGINT) AS _c{tag}{i}"
                for i in range(dims)
            ],
        )

    ca = cent(emb_a, "a")
    cb = cent(emb_b, "b")
    d2 = " + ".join(f"((_ca{i} - _cb{i}) * (_ca{i} - _cb{i}))" for i in range(dims))
    return (
        ca.join(cb, group_col, "full_outer")
        .selectExpr(
            f"`{group_col}`",
            "CAST(coalesce(_n_a, 0) AS BIGINT) AS n_a",
            "CAST(coalesce(_n_b, 0) AS BIGINT) AS n_b",
            f"ROUND(sqrt(CAST(({d2}) AS DOUBLE)) / {scale2!r}D, {int(decimals)}) AS centroid_shift",
        )
        .orderBy(group_col)
    )
