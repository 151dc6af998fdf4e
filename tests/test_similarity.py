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


def test_kmeans_fit_improves_ivf_recall_on_clustered_data(spark):
    # IVF earns its keep on CLUSTERED corpora (real embedding spaces):
    # build 8 well-separated blobs; the fitted quantizer should put a
    # query's neighbors in its own list, where arbitrary pivot rows split
    # them. (On uniform-random vectors fitted ≈ pivots — no structure to
    # learn — measured in evaluations/retrieval_eval.py.)
    rng = np.random.default_rng(11)
    blob_centers = rng.normal(size=(8, DIMS)) * 6
    rows = [
        (i, list(map(float, blob_centers[i % 8] + rng.normal(size=DIMS) * 0.3)))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    qs = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(10)], "q_id long, qv array<double>"
    )

    fitted = similarity.kmeans_fit(df, n_lists=8, iters=10)
    assert len(fitted) == 8 and [c for c, _ in fitted] == list(range(1, 9))
    assert all(abs(sum(x * x for x in cv) - 1.0) < 1e-9 for _, cv in fitted)  # unit norm
    # pivot rows 0, 8, 16, ... all fall in the SAME blob — the failure
    # mode arbitrary pivots risk that a fit cannot have
    pivots = [(c + 1, rows[8 * c][1]) for c in range(8)]

    exact = similarity.knn_brute_force(df, qs, k=5)
    want = {(r.q_id, r.vec_id) for r in exact.collect()}

    def recall(cents, n_probes):
        got = {
            (r.q_id, r.vec_id)
            for r in similarity.knn_ivf(df, cents, qs, k=5, n_probes=n_probes).collect()
        }
        return len(got & want) / len(want)

    assert recall(fitted, 1) > recall(pivots, 1)
    assert recall(fitted, 1) >= 0.9  # blob neighbors land in the query's list


def test_kmeans_fit_deterministic_and_sampled(spark, emb_df):
    df, _ = emb_df
    a = similarity.kmeans_fit(df, n_lists=4, iters=5)
    b = similarity.kmeans_fit(df, n_lists=4, iters=5)
    assert a == b  # same seed, same sample -> bit-identical centroids
    c = similarity.kmeans_fit(df, n_lists=4, iters=5, sample_mod=2)
    assert len(c) == 4


def test_pq_codebooks_shape_and_slicing(emb_df):
    _df, rows = emb_df
    pivots = [(i + 1, rows[i + 1][1]) for i in range(8)]
    cbs = similarity.pq_codebooks(pivots, m=4)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    sub = DIMS // 4
    assert cbs[2][5] == list(rows[6][1][2 * sub : 3 * sub])


def test_pq_self_hit_and_recall_vs_exact(spark, emb_df):
    """The query vector itself survives ADC candidate selection and wins
    the exact rescore; PQ top-10 overlaps exact top-10 substantially."""
    df, rows = emb_df
    pivots = [(i + 1, rows[i + 1][1]) for i in range(8)]
    qv = rows[0][1]
    out = similarity.knn_pq(df, pivots, qv, m=4, k=10, n_candidates=40).collect()
    assert out[0].vec_id == 0 and out[0].score == pytest.approx(1.0)

    exact = similarity.knn_brute_force(df, _queries(spark, rows, n=1), k=10)
    exact_ids = {r.vec_id for r in exact.collect()}
    pq_ids = {r.vec_id for r in out}
    assert len(exact_ids & pq_ids) >= 5  # ADC with 40/N candidates keeps most

    # widening the candidate pool can only improve recall
    wide = {r.vec_id for r in similarity.knn_pq(df, pivots, qv, m=4, k=10, n_candidates=N).collect()}
    assert wide == exact_ids  # full candidate pool == exact ranking


def test_pq_plan_is_scan_plus_takeordered(spark, emb_df):
    df, rows = emb_df
    pivots = [(i + 1, rows[i + 1][1]) for i in range(8)]
    jplan = similarity.knn_pq(df, pivots, rows[0][1], m=4)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in jplan
    assert "Exchange hashpartitioning" not in jplan  # no shuffle anywhere


def test_pq_recall_monotone_in_candidate_pool():
    """ADC recall must grow with the candidate pool (measured, not assumed):
    at sf0.001 the sweep mirrors knn_pq's exact encode/table arithmetic."""
    from evaluations.retrieval_eval import pq_adc_recall

    sweep = pq_adc_recall("/root/testdata/sf0.001", n_queries=20)
    r25, r50, r100 = (sweep[s]["recall"] for s in ("25", "50", "100"))
    assert r25 <= r50 <= r100
    assert r100 > 0.3  # the pool at 20% scan must beat random by a wide margin


def test_hard_negatives_band_and_excludes_self(spark, emb_df):
    df, rows = emb_df
    out = similarity.hard_negatives(
        df, _queries(spark, rows), k=5, lo=0.5, hi=0.95
    ).collect()
    for r in out:
        assert 0.5 <= r.score < 0.95
        assert r.vec_id != r.q_id or r.score < 0.95  # self scores 1.0 -> banded out
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, []).append(r.score)
    for q_id, scores in per_q.items():
        assert len(scores) <= 5
        assert scores == sorted(scores, reverse=True)


def test_matryoshka_full_prefix_equals_brute_force(spark, emb_df):
    df, rows = emb_df
    qv = rows[0][1]
    full = similarity.knn_matryoshka(df, qv, k=5, coarse_dims=DIMS, candidates=50)
    brute = similarity.knn_brute_force(
        df, _queries(spark, rows, n=1), k=5
    ).select("vec_id", "score")
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


def test_matryoshka_recall_improves_with_candidates(spark, emb_df):
    df, rows = emb_df
    qv = rows[0][1]
    exact = {r.vec_id for r in similarity.knn_brute_force(df, _queries(spark, rows, n=1), k=10).collect()}

    def recall(cands):
        got = {r.vec_id for r in similarity.knn_matryoshka(df, qv, 10, coarse_dims=4, candidates=cands).collect()}
        return len(got & exact) / len(exact)

    r_small, r_big = recall(15), recall(120)
    assert r_big >= r_small
    assert r_big >= 0.8  # 120 of 200 candidates must nearly saturate


def test_matryoshka_plan_is_two_takeordered_no_exchange(spark, emb_df):
    df, rows = emb_df
    plan = similarity.knn_matryoshka(df, rows[0][1], 5, 4, 20)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 2
    assert "PythonUDF" not in plan


def test_ivf_partitioned_layout_prunes_files_and_matches_inmemory(spark, emb_df, tmp_path):
    df, rows = emb_df
    centroids = [(i, rows[i][1]) for i in range(1, 9)]
    path = str(tmp_path / "ivf_layout")
    similarity.write_ivf_layout(df, centroids, path)

    qv = rows[0][1]
    got = similarity.knn_ivf_partitioned(spark, path, qv, centroids, k=5, n_probes=2)
    # pruning is physical: the runtime file set (input_file_name during
    # execution — inputFiles() reports the PRE-pruning relation) touches
    # only the probed lists' directories
    probed = set(similarity.probe_list_ids(qv, centroids, 2))
    from pyspark.sql import functions as F
    read_files = [
        r.f
        for r in spark.read.parquet(path)
        .filter(F.col("ivf_cid").isin(list(probed)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert read_files
    assert all(any(f"ivf_cid={cid}" in f for cid in probed) for f in read_files)
    all_files = spark.read.parquet(path).inputFiles()
    assert len(read_files) < len(all_files)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cid" in plan.split("PartitionFilters", 1)[1][:200]

    # same answers as the in-memory knn_ivf on identical centroids/probes
    q = spark.createDataFrame([(0, qv)], "q_id long, qv array<double>")
    expect = sorted(
        (r.vec_id, r.score)
        for r in similarity.knn_ivf(df, centroids, q, k=5, n_probes=2).collect()
    )
    assert sorted((r.vec_id, r.score) for r in got.collect()) == expect


def test_ivf_append_incremental_and_drift_audit(spark, emb_df, tmp_path):
    import hashlib
    import os

    df, rows = emb_df
    centroids = [(i, rows[i][1]) for i in range(1, 5)]
    path = str(tmp_path / "ivf_inc")
    base = df.filter(F.col("vec_id") < 150)
    similarity.write_ivf_layout(base, centroids, path)

    def file_hashes():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    before = file_hashes()

    new = df.filter(F.col("vec_id") >= 150)
    similarity.ivf_append(new, centroids, path)

    # append-only maintenance: every pre-existing file is byte-identical
    after = file_hashes()
    assert all(after[p] == h for p, h in before.items())
    assert len(after) > len(before)

    # the index serves appended vectors without a rebuild
    probe_vec = rows[170][1]
    got = similarity.knn_ivf_partitioned(spark, path, probe_vec, centroids, k=3, n_probes=4)
    assert 170 in [r.vec_id for r in got.collect()]

    audit = similarity.ivf_drift_audit(spark, path, n_total_lists=4).collect()
    assert sum(r.n for r in audit) == N
    assert abs(sum(r.share for r in audit) - 1.0) < 1e-6
    for r in audit:
        assert -1.0 <= r.min_cos <= r.mean_cos <= 1.0


def test_legacy_ivf_layout_rejected_with_remedy(spark, emb_df, tmp_path):
    # a layout written before ivf_cos existed must fail loudly at the API
    # boundary (with the rebuild remedy), not as a missing-column error
    # mid-job or sampled NULLs (ADVICE, similarity.py)
    df, rows = emb_df
    centroids = [(i, rows[i][1]) for i in range(1, 5)]
    path = str(tmp_path / "ivf_legacy")
    # simulate the pre-ivf_cos writer: assignment without the cos column
    similarity.ivf_assign(df, centroids, with_cos=False).write.mode("overwrite").partitionBy(
        "ivf_cid"
    ).parquet(path)

    with pytest.raises(ValueError, match="write_ivf_layout"):
        similarity.ivf_drift_audit(spark, path, n_total_lists=4).collect()
    with pytest.raises(ValueError, match="write_ivf_layout"):
        similarity.ivf_append(df.limit(5), centroids, path)
    # and the guard must not have appended anything to the legacy layout
    assert "ivf_cos" not in spark.read.parquet(path).columns


def test_ivf_assign_with_cos_matches_manual(spark, emb_df):
    import math

    df, rows = emb_df
    centroids = [(i, rows[i][1]) for i in range(1, 5)]
    assigned = {
        r.vec_id: (r.ivf_cid, r.ivf_cos)
        for r in similarity.ivf_assign(df, centroids, with_cos=True).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for vid in (0, 17, 99):
        v = rows[vid][1]
        best = max(((round(cos(v, cv), 6), -cid) for cid, cv in centroids))
        assert assigned[vid] == (-best[1], best[0])


def test_semantic_decontaminate_flags_planted_near_dup(spark):
    # corpus vector 100 is a near-copy of benchmark vector 0; vector 101
    # is orthogonal. Only 100 gets flagged, and its nearest id is 0.
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (7, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(100, [0.99, 0.01, 0.0, 0.0]), (101, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r.vec_id: r
        for r in similarity.semantic_decontaminate(corpus, bench, threshold=0.9).collect()
    }
    assert rows[100].contaminated == 1 and rows[100].nearest_bench_id == 0
    assert rows[100].max_benchmark_cos > 0.99
    assert rows[101].contaminated == 0

    plan = similarity.semantic_decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan  # benchmark side broadcasts
