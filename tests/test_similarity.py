"""kNN operators: brute-force baseline, sign-LSH buckets, multi-probe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators import similarity

DIMS = 8
N = 200
RNG = np.random.default_rng(7)
PLANES = [list(map(float, RNG.normal(size=DIMS))) for _ in range(4)]


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [(i, list(map(float, RNG.normal(size=DIMS)))) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(), rows


def _queries(spark, rows, n=3):
    return spark.createDataFrame(
        [(i, rows[i][1]) for i in range(n)], "q_id long, qv array<double>"
    )


def test_brute_force_self_is_top1(spark, emb_df):
    df, rows = emb_df
    out = similarity.knn_brute_force(df, _queries(spark, rows), k=3)
    top1 = {r.q_id: r.vec_id for r in out.filter("score >= 1.0").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}  # each query finds itself at score 1


def test_probe_buckets_distinct_and_lead_with_own(spark, emb_df):
    df, _ = emb_df
    out = df.select(
        "vec_id",
        similarity.lsh_bucket("embedding", PLANES).alias("bucket"),
        similarity.probe_buckets("embedding", PLANES, n_probes=3).alias("probes"),
    ).collect()
    for r in out:
        assert len(r.probes) == 3
        assert len(set(r.probes)) == 3  # single-bit flips never collide
        assert r.probes[0] == r.bucket


def test_multi_probe_recall_monotone(spark, emb_df):
    df, rows = emb_df
    q = _queries(spark, rows, n=5)
    exact = {
        (r.q_id, r.vec_id) for r in similarity.knn_brute_force(df, q, k=10).collect()
    }

    def recall(n_probes):
        got = {
            (r.q_id, r.vec_id)
            for r in similarity.knn_lsh(df, q, PLANES, k=10, n_probes=n_probes).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4  # more probes never lose candidates
    assert r4 > r1  # and strictly help on this corpus


CENTROIDS = [(c, list(map(float, RNG.normal(size=DIMS)))) for c in range(1, 9)]


def test_ivf_assign_is_nearest_centroid(spark, emb_df):
    df, rows = emb_df
    out = {r.vec_id: r.ivf_cid for r in similarity.ivf_assign(df, CENTROIDS).collect()}
    v = np.array([r[1] for r in rows])
    c = np.array([cv for _, cv in CENTROIDS])
    cos = (v @ c.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :])
    for i, r in enumerate(rows):
        # round-then-argmax with min-cid tie-break, mirroring the operator
        expected = max(range(8), key=lambda j: (round(cos[i, j], 6), -j))
        assert out[r[0]] == expected + 1


def test_ivf_self_hit_and_recall_monotone(spark, emb_df):
    df, rows = emb_df
    qs = _queries(spark, rows)
    exact = similarity.knn_brute_force(df, qs, k=5)
    want = {(r.q_id, r.vec_id) for r in exact.collect()}

    def recall(n_probes):
        got = {
            (r.q_id, r.vec_id)
            for r in similarity.knn_ivf(df, CENTROIDS, qs, k=5, n_probes=n_probes).collect()
        }
        return len(got & want) / len(want)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8
    assert r8 == 1.0  # probing every list IS the exact search
    # each query's own vector is always in its own probed list
    got1 = similarity.knn_ivf(df, CENTROIDS, qs, k=5, n_probes=1)
    self_hits = {r.q_id for r in got1.filter("score >= 1.0").collect()}
    assert self_hits == {0, 1, 2}


def test_ivf_assignment_is_shuffle_free(spark, emb_df):
    df, _ = emb_df
    plan = similarity.ivf_assign(df, CENTROIDS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map: argmax over literal centroids
