"""Unit tests for the feature-prep / audit batch: target encoding
(brute-force LOO parity), negative sampling (distribution + determinism
contracts), salted aggregation (exact equivalence to the direct plan),
referential orphans, JSON schema profiling, session paths, RFM scoring,
and blocking recall arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.operators.curation import negative_sampling, target_encoding
from morphik_core_spark.operators.dedup import blocking_recall
from morphik_core_spark.operators.validation import (
    json_schema_profile,
    referential_orphans,
)
from morphik_core_spark.plans.stats import salted_agg


def test_target_encoding_matches_bruteforce_loo(spark):
    rows = [("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", 0), ("c", 1)]
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["category"]: r for r in target_encoding(df, "cat", "y", m_smoothing=2).collect()}

    prior = 3 / 6
    # a: n=3, pos=2 -> enc = (2 + 2*0.5) / 5 = 0.6
    assert out["a"]["encoded"] == round((2 + 2 * prior) / 5, 6)
    # brute-force LOO for 'a': rows y=1 -> (2-1)/2 = 0.5 ; y=0 -> 2/2 = 1.0
    assert out["a"]["loo_min"] == 0.5
    assert out["a"]["loo_max"] == 1.0
    # b: all-negative -> LOO is 0/1 for every row
    assert out["b"]["loo_min"] == 0.0 and out["b"]["loo_max"] == 0.0
    # c: singleton -> LOO undefined
    assert out["c"]["loo_min"] is None and out["c"]["loo_max"] is None


def test_negative_sampling_is_popularity_proportional_and_deterministic(spark):
    # 3 items with popularity 60/30/10 -> draws should land roughly there
    rows = []
    for i in range(100):
        item = 0 if i < 60 else (1 if i < 90 else 2)
        rows.append((i % 7, item, i))
    pos = spark.createDataFrame(rows, "user_id int, item int, draw_key int")
    out = negative_sampling(pos, "user_id", "item", "draw_key", k=5)
    a = {(r["pos_item"], r["neg_item"]): r["n_draws"] for r in out.collect()}
    b = {(r["pos_item"], r["neg_item"]): r["n_draws"] for r in out.collect()}
    assert a == b  # deterministic across runs
    # no self-negatives by contract
    assert all(p != n for (p, n) in a)
    # popularity ordering: item 0 drawn as a negative far more than item 2
    neg_totals = {}
    for (_, n), c in a.items():
        neg_totals[n] = neg_totals.get(n, 0) + c
    assert neg_totals[0] > neg_totals[1] > neg_totals[2]
    # total draws = 5 per positive minus the self-collisions
    assert sum(neg_totals.values()) <= 500


def test_salted_agg_equals_direct_groupby(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 31 % 101).alias("salt_src"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {"s": "SUM(CAST(v AS DECIMAL(18,2)))", "n": "COUNT(1)", "mx": "MAX(v)"},
        n_salts=8,
        salt_col="salt_src",
    )
    direct = df.groupBy("k").agg(
        F.expr("SUM(CAST(v AS DECIMAL(18,2)))").alias("s"),
        F.expr("COUNT(1)").alias("n"),
        F.expr("MAX(v)").alias("mx"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


def test_referential_orphans_counts_nulls_and_misses(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (99,), (None,)], "fk int"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = referential_orphans([("f->d", fact, "fk", dim, "pk")]).collect()[0]
    assert row["n_rows"] == 5
    assert row["n_orphans"] == 2  # 99 and NULL
    assert row["n_orphan_keys"] == 1  # distinct non-null orphan keys: {99}


def test_referential_orphans_shared_fact_matches_per_edge(spark):
    # two edges on the SAME fact object (grouped into one scan) + one on
    # a different fact must equal three independent single-edge audits
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (99, 20), (None, 30), (2, None)], "fk1 int, fk2 int"
    )
    other = spark.createDataFrame([(7,), (8,)], "fk int")
    d1 = spark.createDataFrame([(1,), (2,)], "pk int")
    d2 = spark.createDataFrame([(10,), (30,)], "pk int")
    d3 = spark.createDataFrame([(8,), (9,)], "pk int")
    edges = [
        ("f.fk1->d1", fact, "fk1", d1, "pk"),
        ("f.fk2->d2", fact, "fk2", d2, "pk"),
        ("other->d3", other, "fk", d3, "pk"),
    ]
    merged = sorted(map(tuple, referential_orphans(edges).collect()))
    single = sorted(
        tuple(referential_orphans([e]).collect()[0]) for e in edges
    )
    assert merged == single


def test_json_schema_profile_type_and_presence(spark):
    df = spark.createDataFrame(
        [('{"a":1,"b":"x"}',), ('{"a":"y"}',), (None,)], "js string"
    )
    out = {r["key"]: r for r in json_schema_profile(df, "js").collect()}
    assert out["a"]["n_present"] == 2
    assert out["a"]["n_numeric"] == 1  # 1 numeric, "y" not
    assert out["a"]["present_rate"] == 1.0  # 2 of 2 non-null rows
    assert out["b"]["n_present"] == 1 and out["b"]["n_numeric"] == 0


def test_blocking_recall_arithmetic(spark):
    truth = spark.createDataFrame([(1, 2), (3, 4), (5, 6), (7, 8)], "id_a int, id_b int")
    cand = spark.createDataFrame(
        [(1, 2), (3, 4), (9, 10), (11, 12)], "id_a int, id_b int"
    )
    row = blocking_recall(truth, cand).collect()[0]
    assert row["n_truth"] == 4 and row["n_candidates"] == 4 and row["n_hits"] == 2
    assert row["recall"] == 0.5 and row["precision"] == 0.5


def test_session_paths_short_sessions_keep_short_paths(spark):
    from morphik_core_spark.operators.sessions import session_paths

    rows = [
        # user 1: one session of 4 events -> path of first 3
        (1, 1, "a", "2024-01-01 00:00:00"),
        (1, 2, "b", "2024-01-01 00:00:10"),
        (1, 3, "c", "2024-01-01 00:00:20"),
        (1, 4, "d", "2024-01-01 00:00:30"),
        # user 1: second session (gap > 60s) of 1 event
        (1, 5, "e", "2024-01-01 01:00:00"),
        # user 2: same opening path as user 1
        (2, 6, "a", "2024-01-01 00:00:00"),
        (2, 7, "b", "2024-01-01 00:00:05"),
        (2, 8, "c", "2024-01-01 00:00:06"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {r["path"]: r for r in session_paths(df, gap_seconds=60).collect()}
    assert out["a>b>c"]["n_sessions"] == 2 and out["a>b>c"]["n_users"] == 2
    assert out["e"]["n_sessions"] == 1


def test_rfm_scores_monotone_in_inputs(spark):
    # 10 users: user i has i+1 events of value 10*(i+1), last at hour i —
    # frequency, monetary and recency all improve with i, so every score
    # should be non-decreasing in i and hit both extremes.
    rows = []
    eid = 0
    for i in range(10):
        for j in range(i + 1):
            rows.append((i, eid, f"2024-01-01 {i:02d}:00:{j:02d}", 10.0 * (i + 1)))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    from morphik_core_spark.operators.analytics import rfm_segments

    out = rfm_segments(df, "user_id", "ts", "value", n_tiles=5).collect()
    assert sum(r["n_users"] for r in out) == 10
    scores = sorted((r["r_score"], r["f_score"], r["m_score"]) for r in out)
    assert scores[0] == (1, 1, 1) and scores[-1] == (5, 5, 5)
