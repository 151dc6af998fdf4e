"""This session's audit/operator batch: skyline, transition matrix,
tumbling-window dedup, zipf slope, n-gram diversity, SQ8 reconstruction
error, curation funnel. Hand-checked semantics + brute-force equivalence;
cross-engine parity lives in test_oracle_parity."""

from __future__ import annotations

import datetime
import math
import random

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.analytics import pareto_frontier_2d, transition_counts
from morphik_core_spark.operators.sessions import keep_first_per_window
from morphik_core_spark.operators.similarity import sq8_reconstruction_error
from morphik_core_spark.operators.text_analysis import ngram_diversity, zipf_slope
from morphik_core_spark.pipeline import curation_funnel


def _ts(s: int):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


# --------------------------------------------------------------- skyline


def _brute_skyline(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2]) for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_pareto_frontier_matches_brute_force(spark):
    rng = random.Random(7)
    # duplicate-heavy value grid so cost/gain ties actually occur
    rows = [(i, float(rng.randrange(0, 12)), rng.randrange(0, 8)) for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, cost DOUBLE, gain INT")
    got = sorted(tuple(r) for r in pareto_frontier_2d(df, "cost", "gain").collect())
    assert got == _brute_skyline(rows)


def test_pareto_frontier_keeps_exact_ties(spark):
    # two rows equal on BOTH dims dominate each other only non-strictly:
    # both stay; the strictly-worse third row goes
    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, 5.0, 10), (3, 5.0, 9)], "id BIGINT, cost DOUBLE, gain INT"
    )
    kept = sorted(r.id for r in pareto_frontier_2d(df, "cost", "gain").collect())
    assert kept == [1, 2]


def test_pareto_frontier_single_bucket_prune_safe(spark):
    # prune_partitions=1 funnels everything through one local prune —
    # result must be identical (the prune only drops provably-dominated)
    rng = random.Random(11)
    rows = [(i, float(rng.randrange(0, 9)), rng.randrange(0, 9)) for i in range(120)]
    df = spark.createDataFrame(rows, "id BIGINT, cost DOUBLE, gain INT")
    a = sorted(tuple(r) for r in pareto_frontier_2d(df, "cost", "gain", 1).collect())
    b = sorted(tuple(r) for r in pareto_frontier_2d(df, "cost", "gain", 32).collect())
    assert a == b == _brute_skyline(rows)


# ----------------------------------------------------------- transitions


def test_transition_counts_hand_case(spark):
    rows = [
        (1, _ts(0), "a", 1),
        (1, _ts(1), "b", 2),
        (1, _ts(2), "a", 3),
        (1, _ts(3), "b", 4),
        (2, _ts(0), "a", 5),
        (2, _ts(1), "a", 6),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, state STRING, id BIGINT")
    got = {
        (r.prev_state, r.next_state): (r.n_transitions, r.prob)
        for r in transition_counts(df, "user_id", "ts", "state", "id").collect()
    }
    assert got == {
        ("a", "b"): (2, pytest.approx(2 / 3)),
        ("b", "a"): (1, 1.0),
        ("a", "a"): (1, pytest.approx(1 / 3)),
    }


def test_transition_probs_sum_to_one_per_prev(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(5), _ts(i), rng.choice("xyz"), i) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, state STRING, id BIGINT")
    out = transition_counts(df, "user_id", "ts", "state", "id")
    sums = out.groupBy("prev_state").agg(F.sum("prob").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-4 for r in sums)  # rounded probs


def test_transition_ties_break_on_tiebreak_col(spark):
    # same timestamp: order must follow the tiebreak id, so a->b, b->c
    rows = [(1, _ts(0), "a", 1), (1, _ts(0), "b", 2), (1, _ts(0), "c", 3)]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, state STRING, id BIGINT")
    got = {(r.prev_state, r.next_state) for r in transition_counts(df, "user_id", "ts", "state", "id").collect()}
    assert got == {("a", "b"), ("b", "c")}


# --------------------------------------------------- keep_first_per_window


def test_keep_first_per_window_hand_case(spark):
    rows = [
        (1, "u1", "click", _ts(10)),     # window 0: kept (earliest)
        (2, "u1", "click", _ts(3599)),   # window 0: dropped
        (3, "u1", "click", _ts(3600)),   # window 1: kept (boundary starts new window)
        (4, "u1", "view", _ts(20)),      # different type: kept
        (5, "u2", "click", _ts(30)),     # different user: kept
    ]
    df = spark.createDataFrame(rows, "event_id BIGINT, user_id STRING, event_type STRING, ts TIMESTAMP")
    out = keep_first_per_window(df, ["user_id", "event_type"], "ts", "event_id", 3600)
    kept = {r.event_id: r.n_in_window for r in out.collect()}
    assert kept == {1: 2, 3: 1, 4: 1, 5: 1}


def test_keep_first_window_start_is_epoch_aligned(spark):
    df = spark.createDataFrame(
        [(1, "u", "t", _ts(4000))], "event_id BIGINT, user_id STRING, event_type STRING, ts TIMESTAMP"
    )
    row = keep_first_per_window(df, ["user_id", "event_type"], "ts", "event_id", 3600).first()
    assert row.window_start.minute == 0 and row.window_start.second == 0


def test_keep_first_same_ts_min_id_wins(spark):
    df = spark.createDataFrame(
        [(9, "u", "t", _ts(0)), (2, "u", "t", _ts(0))],
        "event_id BIGINT, user_id STRING, event_type STRING, ts TIMESTAMP",
    )
    out = keep_first_per_window(df, ["user_id", "event_type"], "ts", "event_id", 3600).collect()
    assert [r.event_id for r in out] == [2]


# ------------------------------------------------------------ zipf slope


def test_zipf_slope_recovers_exact_power_law(spark):
    # freq(rank) = round(1000 * rank^-1): slope of ln f on ln r ≈ -1
    docs = []
    vocab = [f"w{i:03d}" for i in range(40)]
    text_parts = []
    for r, w in enumerate(vocab, start=1):
        text_parts.extend([w] * max(1, round(1000 / r)))
    docs.append((1, " ".join(text_parts), "s"))
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING, source STRING")
    row = zipf_slope(df, "text", "source").first()
    assert row.n_terms == 40
    assert row.zipf_slope == pytest.approx(-1.0, abs=0.05)


def test_zipf_slope_scaled_ints_bound(spark):
    # the documented overflow bound: |ln|*1e5 <= ~2e6 per term at any
    # realistic freq; verify terms and sums stay well inside int64 for a
    # top_n=1000-sized group with astronomical counts
    x = round(math.log(1000) * 1e5)
    y = round(math.log(1e15) * 1e5)
    assert 1000 * 1000 * x * y < 2**63  # n * Σxy bound


def test_zipf_flat_distribution_slope_zero(spark):
    # all tokens equally frequent -> slope 0 (ln f constant)
    text = " ".join(w for w in ["aa", "bb", "cc", "dd"] * 25)
    df = spark.createDataFrame([(1, text, "s")], "doc_id BIGINT, text STRING, source STRING")
    assert zipf_slope(df, "text", "source").first().zipf_slope == 0.0


# -------------------------------------------------------- ngram diversity


def test_ngram_diversity_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c", "rep"),    # grams: abc bca cab abc -> 4 total, 3 distinct
            (2, "p q r s", "uniq"),       # pqr qrs -> 2 total, 2 distinct
        ],
        "doc_id BIGINT, text STRING, source STRING",
    )
    got = {r.source: (r.n_grams, r.n_distinct, r.diversity) for r in ngram_diversity(df, "text", "source").collect()}
    assert got == {"rep": (4, 3, 0.75), "uniq": (2, 2, 1.0)}


def test_ngram_diversity_counts_cross_document_repeats(spark):
    # two documents with identical text: per-doc distinct would hide it;
    # source-level diversity must see 2x totals, 1x distinct
    df = spark.createDataFrame(
        [(1, "x y z w", "s"), (2, "x y z w", "s")], "doc_id BIGINT, text STRING, source STRING"
    )
    row = ngram_diversity(df, "text", "source").first()
    assert (row.n_grams, row.n_distinct) == (4, 2)


# ------------------------------------------------------------- sq8 error


def test_sq8_error_zero_for_exactly_representable_grid(spark):
    # values on the exact 255-step grid between min and max reconstruct
    # losslessly -> MSE 0
    grid = [0.0, 1.0 / 255.0 * 51, 1.0]  # codes 0, 51, 255 exactly
    rows = [(i, [v, v], 0) for i, v in enumerate(grid)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = sq8_reconstruction_error(df, dims=2).collect()
    assert len(out) == 1 and out[0].mean_mse == 0.0 and out[0].max_mse == 0.0


def test_sq8_error_constant_dim_reconstructs_min(spark):
    # span-0 dimension reconstructs to its minimum -> zero error there,
    # real error only from the varying dim
    rows = [(1, [0.5, 0.0], 0), (2, [0.5, 0.9], 0), (3, [0.5, 0.33], 1)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    got = {r.label: r for r in sq8_reconstruction_error(df, dims=2).collect()}
    assert got[0].mean_mse >= 0.0 and got[0].max_mse < 1e-5  # quantization-scale error
    assert got[1].n_vecs == 1


# -------------------------------------------------------- curation funnel


def test_curation_funnel_stage_counts(spark):
    good = "the quick brown fox jumps over the lazy dog and that is good for it " * 2
    rows = [
        (1, good, "en"),            # survives everything
        (2, good, "en"),            # exact dup of 1 -> dropped at dedup
        (3, good, "zh"),            # dropped at language gate
        (4, "short text", "en"),    # dropped at quality (word count)
        (5, None, "en"),            # dropped at input
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    got = {r.stage: r.n_docs for r in curation_funnel(df, lang_col="lang", keep_langs=("en",)).collect()}
    assert got == {"input": 4, "language_id": 3, "quality_filter": 2, "exact_dedup": 1}


def test_curation_funnel_keeper_reelected_when_parent_fails_quality(spark):
    # doc 1 and doc 2 share text but doc 1 is filtered by language: the
    # keeper among survivors is doc 2, so the group still keeps one row
    good = "the quick brown fox jumps over the lazy dog and that is good for it " * 2
    df = spark.createDataFrame(
        [(1, good, "zh"), (2, good, "en")], "doc_id BIGINT, text STRING, lang STRING"
    )
    got = {r.stage: r.n_docs for r in curation_funnel(df, lang_col="lang", keep_langs=("en",)).collect()}
    assert got["exact_dedup"] == 1


def test_curation_funnel_detector_path(spark):
    # without lang_col the detector runs; an English-stopword text is
    # predicted 'en' and survives an en-only gate
    good = "the quick brown fox jumps over the lazy dog and that is good for it " * 2
    df = spark.createDataFrame([(1, good, "xx")], "doc_id BIGINT, text STRING, lang STRING")
    got = {r.stage: r.n_docs for r in curation_funnel(df, keep_langs=("en",)).collect()}
    assert got["language_id"] == 1


# ------------------------------------------------------- length bucketing

from morphik_core_spark.operators.curation import length_bucketing


def test_length_bucketing_hand_case(spark):
    texts = [
        (1, " ".join(["w"] * 10)),   # bucket 16, eff 10
        (2, " ".join(["w"] * 16)),   # bucket 16, eff 16 (boundary inclusive)
        (3, " ".join(["w"] * 17)),   # bucket 32
        (4, " ".join(["w"] * 100)),  # > max -> bucket 64, truncated, eff 64
    ]
    df = spark.createDataFrame(texts, "doc_id BIGINT, text STRING")
    got = {r.bucket: r for r in length_bucketing(df, "text", "doc_id", buckets=(16, 32, 64)).collect()}
    assert got[16].n_docs == 2 and got[16].effective_tokens == 26 and got[16].padded_tokens == 32
    assert got[16].n_truncated == 0
    assert got[32].n_docs == 1 and got[32].waste_ratio == pytest.approx(15 / 32, abs=1e-6)
    assert got[64].n_truncated == 1 and got[64].effective_tokens == 64


def test_length_bucketing_waste_zero_when_exact(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 32))], "doc_id BIGINT, text STRING"
    )
    row = length_bucketing(df, "text", "doc_id", buckets=(16, 32, 64)).first()
    assert row.bucket == 32 and row.waste_ratio == 0.0


# ------------------------------------------------------------- centroids

from morphik_core_spark.operators.embedding_stats import (
    centroid_confusion,
    label_centroids,
)


def test_label_centroids_exact_means(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [3.0, 0.5], 0), (3, [10.0, -1.0], 1)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    got = {r.label: r for r in label_centroids(df, dims=2).collect()}
    assert got[0].centroid == [2.0, 0.25] and got[0].n_vecs == 2
    assert got[1].centroid == [10.0, -1.0]


def test_label_centroids_no_negative_zero(spark):
    # a mean that rounds to zero from below must surface as +0.0
    rows = [(1, [-1e-9], 0), (2, [0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    v = label_centroids(df, dims=1).first().centroid[0]
    assert repr(v) == "0.0"


def test_centroid_confusion_separable_classes_diagonal(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    got = {(r.true_label, r.assigned_label): r.n_vecs for r in centroid_confusion(df, dims=2).collect()}
    assert got == {(0, 0): 2, (1, 1): 2}


def test_centroid_confusion_flags_mislabeled_vector(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1), (5, [0.0, 1.0], 1),
        (6, [0.0, 1.0], 0),  # mislabeled: sits on class 1's centroid
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    got = {(r.true_label, r.assigned_label): r.n_vecs for r in centroid_confusion(df, dims=2).collect()}
    assert got[(0, 1)] == 1  # the off-diagonal hit
