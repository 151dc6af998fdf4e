"""Quality classifier: learns on separable data, bit-reproducible under
repartitioning, and the scoring map matches a hand-computed fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.classifier import (
    MICRO,
    fast_sigmoid,
    logreg_score,
    logreg_train,
    quality_features,
)


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        if i % 2 == 0:  # positives: long, alphabetic
            text = " ".join(f"quality wording number{j}" for j in range(40 + i % 7))
            y = 1
        else:  # negatives: short, symbol-heavy
            text = "@@ ## $$ %% " * (1 + i % 3)
            y = 0
        rows.append((i, text, y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_trainer_separates_separable_corpus(spark):
    df = _corpus(spark)
    feats = quality_features(F.col("text"))
    w = logreg_train(df, feats, F.col("y"), iterations=5)
    assert len(w) == 4 and any(abs(x) > 0.01 for x in w)
    scored = logreg_score(df, feats, w)
    means = {
        r["y"]: r["m"]
        for r in scored.groupBy("y").agg(F.avg("quality_score").alias("m")).collect()
    }
    assert means[1] > means[0] + 0.05  # real separation, not noise


def test_training_is_partition_invariant(spark):
    df = _corpus(spark)
    feats = quality_features(F.col("text"))
    label = F.col("y")
    w3 = logreg_train(df.repartition(3), feats, label, iterations=4)
    w17 = logreg_train(df.repartition(17), feats, label, iterations=4)
    assert w3 == w17  # bit-identical: integer gradient sums are order-free


def test_score_matches_hand_fold(spark):
    df = spark.createDataFrame([(1, "abc def")], "id long, text string")
    feats = quality_features(F.col("text"))
    w = [0.25, -0.5, 1.0, 0.125]
    got = logreg_score(df, feats, w).first()["quality_score"]
    # hand fold: f = [1, 7/5000, 2/1000, 6/7]
    z = 1.0 * 0.25 + (7 / 5000) * -0.5 + (2 / 1000) * 1.0 + (6 / 7) * 0.125
    want = round(0.5 + z / (2.0 * (1.0 + abs(z))), 6)
    assert got == pytest.approx(want, abs=1e-9)


def test_fast_sigmoid_shape(spark):
    df = spark.range(1).select(
        fast_sigmoid(F.lit(0.0)).alias("mid"),
        fast_sigmoid(F.lit(1e9)).alias("hi"),
        fast_sigmoid(F.lit(-1e9)).alias("lo"),
    )
    r = df.first()
    assert r["mid"] == 0.5 and 0.999 < r["hi"] < 1.0 and 0.0 < r["lo"] < 0.001


def test_lr_must_be_positive_integer(spark):
    df = _corpus(spark, 4)
    with pytest.raises(ValueError, match="integer"):
        logreg_train(df, quality_features(F.col("text")), F.col("y"), lr=0.5)


def test_empty_corpus_returns_zero_weights(spark):
    df = spark.createDataFrame([], "doc_id long, text string, y int")
    w = logreg_train(df, quality_features(F.col("text")), F.col("y"), iterations=3)
    assert w == [0.0, 0.0, 0.0, 0.0]
    assert MICRO == 1_000_000
