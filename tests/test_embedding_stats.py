"""Embedding covariance / PCA: exactness, determinism, and the spectral
invariants (oracle parity for the covariance query is in
test_oracle_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest

from morphik_core_spark.operators import embedding_stats

DIMS = 6
N = 400


@pytest.fixture(scope="module")
def corr_df(spark):
    """Deterministic correlated cloud: dim0 dominates, dim1 = 0.8*dim0 +
    noise, rest small — a known principal-axis structure."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=N) * 3.0
    x = np.stack(
        [
            base,
            0.8 * base + rng.normal(size=N) * 0.3,
            rng.normal(size=N) * 0.5,
            rng.normal(size=N) * 0.4,
            rng.normal(size=N) * 0.3,
            rng.normal(size=N) * 0.2,
        ],
        axis=1,
    )
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    return df, x


def test_covariance_sums_match_numpy_int_space(spark, corr_df):
    df, x = corr_df
    out = {(r.i, r.j): (r.sij, r.cov) for r in embedding_stats.covariance_sums(df, DIMS).collect()}
    q = np.floor(x * 1024.0).astype(np.int64)
    g = q.T @ q
    s1 = q.sum(axis=0)
    for i in range(DIMS):
        for j in range(i, DIMS):
            sij, cov = out[(i, j)]
            assert sij == g[i, j], (i, j)
            expected = (g[i, j] - s1[i] * s1[j] / N) / (N - 1)
            assert cov == pytest.approx(expected, abs=1e-6)


def test_covariance_partition_invariant(spark, corr_df):
    df, _ = corr_df
    a = sorted(map(tuple, embedding_stats.covariance_sums(df, DIMS).collect()))
    b = sorted(map(tuple, embedding_stats.covariance_sums(df.repartition(13), DIMS).collect()))
    assert a == b  # int64 sums are layout-independent, bit-for-bit


def test_pca_fit_recovers_dominant_axis(spark, corr_df):
    df, x = corr_df
    mean, comps, evar = embedding_stats.pca_fit(df, DIMS)
    # variance sorted descending, components orthonormal
    assert all(evar[k] >= evar[k + 1] for k in range(DIMS - 1))
    assert np.allclose(comps @ comps.T, np.eye(DIMS), atol=1e-9)
    # the top axis must be dominated by dims 0/1 (the correlated pair)
    assert abs(comps[0][0]) > 0.5 and abs(comps[0][1]) > 0.3
    assert np.allclose(mean, x.mean(axis=0), atol=2e-3)  # quantization error only
    # deterministic across refits
    mean2, comps2, evar2 = embedding_stats.pca_fit(df, DIMS)
    assert np.array_equal(comps, comps2) and np.array_equal(evar, evar2)


def test_pca_project_matches_numpy_and_orders_variance(spark, corr_df):
    df, x = corr_df
    mean, comps, _ = embedding_stats.pca_fit(df, DIMS)
    k = 3
    out = embedding_stats.pca_project(df, mean, comps, k).select("vec_id", "pca").collect()
    got = np.array([r.pca for r in sorted(out, key=lambda r: r.vec_id)])
    expected = (x - mean) @ comps[:k].T
    # quantized covariance => axes near-exact vs float PCA of the same stats
    assert np.allclose(got, expected, atol=1e-6)
    v = got.var(axis=0)
    assert v[0] >= v[1] >= v[2]


def test_pca_project_plan_has_no_python_and_no_shuffle(spark, corr_df):
    df, x = corr_df
    mean, comps, _ = embedding_stats.pca_fit(df, DIMS)
    plan = embedding_stats.pca_project(df, mean, comps, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_simplified_silhouette_separated_and_boundary(spark):
    """Two tight, well-separated clusters must score near 1; a point
    equidistant between both centroids must pull its cluster's mean
    toward 0; values must match the direct centroid-silhouette
    computed in Python within quantization tolerance."""
    from morphik_core_spark.operators.embedding_stats import simplified_silhouette

    dims = 4
    a_pts = [[0.0, 0.0, 0.0, 0.0], [0.2, 0.0, 0.0, 0.0], [-0.2, 0.0, 0.0, 0.0]]
    b_pts = [[10.0, 0.0, 0.0, 0.0], [10.2, 0.0, 0.0, 0.0], [9.8, 0.0, 0.0, 0.0]]
    rows = [(i, v, 0) for i, v in enumerate(a_pts)] + [
        (i + 10, v, 1) for i, v in enumerate(b_pts)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in simplified_silhouette(df, dims=dims).collect()}
    assert out[0]["n_vecs"] == 3 and out[1]["n_vecs"] == 3

    def sil(pts, own_c, other_c):
        import math
        ss = []
        for p in pts:
            a = math.dist(p, own_c)
            b = math.dist(p, other_c)
            ss.append(0.0 if max(a, b) == 0 else (b - a) / max(a, b))
        return sum(ss) / len(ss)

    ca = [sum(x) / 3 for x in zip(*a_pts)]
    cb = [sum(x) / 3 for x in zip(*b_pts)]
    assert out[0]["mean_silhouette"] == pytest.approx(sil(a_pts, ca, cb), abs=1e-3)
    assert out[1]["mean_silhouette"] == pytest.approx(sil(b_pts, cb, ca), abs=1e-3)
    assert out[0]["mean_silhouette"] > 0.9


def test_simplified_silhouette_overlapping_clusters_near_zero(spark):
    """Two interleaved clusters (same distribution, split arbitrarily)
    must score near zero — the op must not invent separation."""
    from morphik_core_spark.operators.embedding_stats import simplified_silhouette

    rows = [
        (i, [float((i * 37) % 11) / 11.0, float((i * 53) % 7) / 7.0], i % 2)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = simplified_silhouette(df, dims=2).collect()
    for r in out:
        assert abs(r["mean_silhouette"]) < 0.25, r


def test_embedding_drift_hand_values_and_missing_groups(spark):
    """Shift equals the Euclidean distance between the two snapshots'
    centroids; groups present on one side only emit NULL shift with
    zero counts on the missing side."""
    from morphik_core_spark.operators.embedding_stats import embedding_drift

    a = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0), (2, [2.0, 0.0], 0),   # centroid (1, 0)
            (3, [5.0, 5.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    b = spark.createDataFrame(
        [
            (4, [4.0, 4.0], 0), (5, [4.0, 4.0], 0),   # centroid (4, 4)
            (6, [1.0, 1.0], 2),                        # new group
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in embedding_drift(a, b, dims=2).collect()}
    # shift(0) = dist((1,0),(4,4)) = 5
    assert out[0]["centroid_shift"] == pytest.approx(5.0, abs=1e-3)
    assert out[0]["n_a"] == 2 and out[0]["n_b"] == 2
    assert out[1]["n_b"] == 0 and out[1]["centroid_shift"] is None
    assert out[2]["n_a"] == 0 and out[2]["centroid_shift"] is None


def test_embedding_drift_zero_for_identical_snapshots(spark):
    from morphik_core_spark.operators.embedding_stats import embedding_drift

    rows = [(i, [float((i * 7) % 5), float((i * 3) % 4)], i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_drift(df, df, dims=2).collect()
    assert all(r["centroid_shift"] == 0.0 for r in out)
