"""Unit tests for the round-6 operator additions: bucket-decomposed
interval joins, KMV set-overlap sketches, C4 page cleaning, per-group
uniform sampling, and the training-shard planner.

The oracle-parity gate already pins each driver query's values vs DuckDB;
these tests pin the *operator* properties the oracle can't see:
equivalence of the bucket decomposition to a naive range join on adversarial
axes (negatives, bucket-boundary hits), KMV estimator accuracy bounds,
rule-level C4 behavior, and the sampling/sharding invariants (per-group
counts, append stability, partitioning independence).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.asof import interval_point_join
from morphik_core_spark.operators.curation import (
    c4_line_filters,
    group_sample,
    training_shards,
)
from morphik_core_spark.operators.sketches import kmv_overlap, kmv_sketch


# ------------------------------------------------------------ intervals


def _naive_join(points, intervals, pc, lo, hi):
    return points.crossJoin(intervals).filter(
        (F.col(pc) >= F.col(lo)) & (F.col(pc) <= F.col(hi))
    )


@pytest.mark.parametrize("width", [1, 7, 32])
def test_interval_join_matches_naive(spark, width):
    # axis straddles 0 and bucket boundaries; intervals include empty-span
    # (lo == hi), cross-bucket, and exactly-one-bucket cases
    points = spark.createDataFrame(
        [(p,) for p in range(-40, 41, 3)], "p long"
    )
    intervals = spark.createDataFrame(
        [(i, -37 + (i * 11) % 70, 0) for i in range(30)], "iid long, lo long, hi long"
    ).withColumn("hi", F.col("lo") + (F.col("iid") * 7) % 23)
    got = interval_point_join(points, intervals, "p", "lo", "hi", bucket_width=width)
    want = _naive_join(points, intervals, "p", "lo", "hi")
    key = lambda r: (r.p, r.iid)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_interval_join_boundary_inclusive(spark):
    pts = spark.createDataFrame([(10,), (11,), (20,), (21,)], "p long")
    iv = spark.createDataFrame([(1, 11, 20)], "iid long, lo long, hi long")
    got = interval_point_join(pts, iv, "p", "lo", "hi", bucket_width=4)
    assert sorted(r.p for r in got.collect()) == [11, 20]


def test_interval_join_fanout_bounded(spark):
    # an interval of length L lands in exactly L//w + 1 or fewer buckets
    iv = spark.createDataFrame([(1, 0, 63)], "iid long, lo long, hi long")
    pts = spark.createDataFrame([(0,)], "p long")
    joined = interval_point_join(pts, iv, "p", "lo", "hi", bucket_width=32)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ KMV


def test_kmv_exact_below_k(spark):
    # group with fewer than k distinct values: sketch IS the value set
    df = spark.createDataFrame([("a", f"v{i % 5}") for i in range(50)], "k string, v string")
    sk = kmv_sketch(df, "k", "v", k=64)
    assert sk.count() == 5  # distinct values, all retained


def test_kmv_estimate_accuracy(spark):
    # 2000 distinct values, k=128: KMV std error ~ 1/sqrt(k-2) ≈ 8.9%;
    # assert within 4 sigma so the test is deterministic-safe
    df = spark.createDataFrame([("a", f"value-{i}") for i in range(2000)], "k string, v string")
    sk = kmv_sketch(df, "k", "v", k=128)
    row = sk.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"), F.max("v").alias("kth")).first()
    est = 127.0 * float(1 << 30) / float(row.kth)
    assert abs(est - 2000) / 2000 < 0.36


def test_kmv_overlap_identical_sets(spark):
    # two keys with identical value sets: jaccard estimate is exactly 1
    rows = [(k, f"value-{i}") for k in ("a", "b") for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v string")
    sk = kmv_sketch(df, "k", "v", k=128)
    out = kmv_overlap(sk, "k", k=128).first()
    assert out.est_jaccard == 1.0
    assert out.match_k == 128
    assert out.est_containment_a == 1.0 and out.est_containment_b == 1.0


def test_kmv_overlap_disjoint_sets(spark):
    rows = [("a", f"left-{i}") for i in range(500)] + [("b", f"right-{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v string")
    sk = kmv_sketch(df, "k", "v", k=128)
    out = kmv_overlap(sk, "k", k=128).first()
    assert out.est_jaccard == 0.0
    assert out.match_k == 0
    assert out.est_containment_a == 0.0 and out.est_containment_b == 0.0


# ------------------------------------------------------------ C4


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "this line has enough words to pass.",  # kept
            "too short.",  # < 5 words
            "this line has five words total",  # no terminal punct
            'a quoted line with five words"',  # kept (quote terminal)
            "another fine sentence with many words!",  # kept
        ]
    )
    row = c4_line_filters(
        spark.createDataFrame([(1, text)], "id long, t string"), "t", "id"
    ).first()
    assert row.n_lines == 5
    assert row.n_kept == 3
    assert row.doc_pass  # 3 kept lines, no flags
    assert row.text_clean.count("\n") == 2


def test_c4_page_flags(spark):
    good = "one fine sentence right here okay.\n" * 3
    rows = {
        1: good,
        2: good + "\nsome Lorem Ipsum boilerplate.",
        3: good + "\nvar x = { a: 1 };",
        4: "short.",
    }
    out = {
        r.id: r
        for r in c4_line_filters(
            spark.createDataFrame(list(rows.items()), "id long, t string"), "t", "id"
        ).collect()
    }
    assert out[1].doc_pass
    assert out[2].has_lorem and not out[2].doc_pass
    assert out[3].has_brace and not out[3].doc_pass
    assert not out[4].doc_pass  # too few kept lines


# ------------------------------------------------------------ sampling / shards


def test_group_sample_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 100 else "small") for i in range(106)], "id long, g string"
    )
    out = group_sample(df, "id", "g", k=10)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 10, "small": 6}
    # partitioning independence: same winners under a different layout
    again = group_sample(df.repartition(7), "id", "g", k=10)
    key = lambda r: (r.g, r.id, r.rk)  # noqa: E731
    assert sorted(map(key, out.collect())) == sorted(map(key, again.collect()))


def test_training_shards_append_stable(spark):
    base = spark.createDataFrame([(i, 10, "s") for i in range(200)], "id long, tok long, g string")
    more = spark.createDataFrame(
        [(i, 10, "s") for i in range(200, 300)], "id long, tok long, g string"
    )

    def assignments(df):
        from morphik_core_spark.operators.dedup import portable_hash

        sid = F.concat(F.lit("shard:"), F.col("id").cast("string"))
        return {
            r.id: r.shard
            for r in df.select("id", F.pmod(portable_hash(sid), F.lit(16)).alias("shard")).collect()
        }

    a1 = assignments(base)
    a2 = assignments(base.unionByName(more))
    assert all(a2[i] == a1[i] for i in a1)  # appends never move old docs

    audit = training_shards(base.unionByName(more), "id", "tok", "g", n_shards=16)
    rows = audit.collect()
    assert sum(r.n_docs for r in rows) == 300
    assert len(rows) <= 16


# ------------------------------------------------------------ CDC / c-TF-IDF


def test_cdc_apply_ops(spark):
    from morphik_core_spark.operators.docstore import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")], "id long, v string, op string"
    )
    out = {r.id: r.v for r in cdc_apply(snap, changes, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 replaced, 4 inserted


def test_cdc_apply_insert_on_existing_key_upserts(spark):
    # upsert-style feeds emit 'I' for keys already in the snapshot; the
    # result must carry exactly one row for that key (the incoming one),
    # never a silent duplicate (ADVICE, docstore.py cdc_apply)
    from morphik_core_spark.operators.docstore import cdc_apply

    snap = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    changes = spark.createDataFrame([(2, "B2", "I")], "id long, v string, op string")
    rows = sorted(tuple(r) for r in cdc_apply(snap, changes, ["id"]).collect())
    assert rows == [(1, "a"), (2, "B2")]


def test_interval_join_tolerates_malformed_intervals(spark):
    # hi < lo and NULL bounds: BETWEEN matches nothing; the bucket
    # decomposition must drop those rows instead of letting F.sequence
    # throw 'illegal sequence boundaries' and kill the job (ADVICE)
    pts = spark.createDataFrame([(5,), (15,)], "p long")
    iv = spark.createDataFrame(
        [(1, 20, 10), (2, None, 8), (3, 4, None), (4, 10, 20)],
        "iid long, lo long, hi long",
    )
    got = interval_point_join(pts, iv, "p", "lo", "hi", bucket_width=4)
    assert sorted((r.p, r.iid) for r in got.collect()) == [(15, 4)]


def test_cdc_apply_empty_batch(spark):
    from morphik_core_spark.operators.docstore import cdc_apply

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    empty = spark.createDataFrame([], "id long, v string, op string")
    assert [tuple(r) for r in cdc_apply(snap, empty, ["id"]).collect()] == [(1, "a")]


def test_ctfidf_distinguishes_clusters(spark):
    from morphik_core_spark.operators.text_analysis import ctfidf_keywords

    rows = [
        (1, "c1", "apple apple apple shared shared"),
        (2, "c1", "apple shared"),
        (3, "c2", "banana banana banana shared shared"),
        (4, "c2", "banana shared"),
    ]
    df = spark.createDataFrame(rows, "id long, cl string, t string")
    out = ctfidf_keywords(df, "t", "cl", top_n=1)
    top = {r.cluster: r.term for r in out.collect()}
    # the cluster-exclusive term must outrank the corpus-wide one
    assert top == {"c1": "apple", "c2": "banana"}


def test_kmv_containment_asymmetric(spark):
    # B is a strict subset of A at a quarter the size: containment of the
    # intersection in B must be ~1 while in A it is ~1/4
    rows = [("a", f"value-{i}") for i in range(2000)] + [
        ("b", f"value-{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    out = kmv_overlap(kmv_sketch(df, "k", "v", k=128), "k", k=128).first()
    # three compounded KMV estimates at k=128 carry ~15% noise; the
    # assertion is the ORDERING and rough magnitude, not tight values
    assert out.est_containment_b > 0.65  # B inside A
    assert 0.1 < out.est_containment_a < 0.5  # A only quarter-covered
    assert out.est_containment_b > 2 * out.est_containment_a


def test_interval_join_property(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        pts=st.lists(st.integers(-200, 200), min_size=1, max_size=25),
        ivs=st.lists(
            st.tuples(st.integers(-200, 200), st.integers(0, 40)),
            min_size=1,
            max_size=25,
        ),
        width=st.integers(1, 64),
    )
    def check(pts, ivs, width):
        points = spark.createDataFrame([(p,) for p in set(pts)], "p long")
        intervals = spark.createDataFrame(
            [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivs)], "iid long, lo long, hi long"
        )
        got = sorted(
            (r.p, r.iid)
            for r in interval_point_join(points, intervals, "p", "lo", "hi", width).collect()
        )
        want = sorted(
            (p, i)
            for p in set(pts)
            for i, (lo, ln) in enumerate(ivs)
            if lo <= p <= lo + ln
        )
        assert got == want

    check()
