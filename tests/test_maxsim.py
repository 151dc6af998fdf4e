"""MaxSim: relational form, pandas fast path, and packed-bit Hamming kernel
must agree with each other and with a plain-numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from morphik_core_spark.functions.quantization import (
    binary_quantize_udf,
    hamming_maxsim_packed,
    multivector_quantize_udf,
)
from morphik_core_spark.operators.maxsim import (
    maxsim_hamming_relational,
    maxsim_pandas,
    maxsim_relational,
)

DIMS = 16
N_CHUNKS = 30
RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def mv_df(spark):
    rows = []
    for doc in range(N_CHUNKS):
        n_tokens = int(RNG.integers(3, 9))
        mv = RNG.normal(size=(n_tokens, DIMS)).astype(np.float64)
        rows.append((doc, 0, [list(map(float, t)) for t in mv]))
    df = spark.createDataFrame(rows, "document_id long, chunk_number int, multivector array<array<double>>")
    return df.cache(), rows


QUERY = RNG.normal(size=(4, DIMS)).astype(np.float64)


def _numpy_maxsim(rows, q):
    out = {}
    for doc, _, mv in rows:
        d = np.asarray(mv)
        out[doc] = float((q @ d.T).max(axis=1).sum())
    return out


def test_relational_matches_numpy(mv_df):
    df, rows = mv_df
    got = {r.document_id: r.maxsim for r in maxsim_relational(df, QUERY.tolist()).collect()}
    want = _numpy_maxsim(rows, QUERY)
    for doc in want:
        assert got[doc] == pytest.approx(want[doc], rel=1e-12)


def test_pandas_matches_relational(mv_df):
    df, _ = mv_df
    rel = {r.document_id: r.maxsim for r in maxsim_relational(df, QUERY.tolist()).collect()}
    fast = {r.document_id: r.maxsim for r in maxsim_pandas(df, QUERY.tolist()).collect()}
    for doc in rel:
        assert fast[doc] == pytest.approx(rel[doc], rel=1e-12)


def test_null_and_empty_multivectors_score_zero(spark):
    # parity between the two forms on degenerate rows: a NULL or empty
    # multivector must appear in the result with maxsim 0.0, not vanish
    rows = [
        (1, 0, [[1.0] * DIMS]),
        (2, 0, []),
        (3, 0, None),
    ]
    df = spark.createDataFrame(
        rows, "document_id long, chunk_number int, multivector array<array<double>>"
    )
    rel = {r.document_id: r.maxsim for r in maxsim_relational(df, QUERY.tolist()).collect()}
    fast = {r.document_id: r.maxsim for r in maxsim_pandas(df, QUERY.tolist()).collect()}
    assert set(rel) == set(fast) == {1, 2, 3}
    assert rel[2] == rel[3] == 0.0
    for doc in rel:
        assert fast[doc] == pytest.approx(rel[doc], rel=1e-12)


def test_packed_hamming_matches_relational(mv_df):
    df, _ = mv_df
    rel = {r.document_id: r.maxsim for r in maxsim_hamming_relational(df, QUERY.tolist()).collect()}

    q_packed = [np.packbits(t > 0).tobytes() for t in QUERY]
    packed_df = df.withColumn("packed", multivector_quantize_udf(F.col("multivector")))
    scorer = hamming_maxsim_packed(q_packed, DIMS)
    fast = {r.document_id: r.maxsim for r in packed_df.select("document_id", scorer("packed").alias("maxsim")).collect()}
    for doc in rel:
        assert fast[doc] == pytest.approx(rel[doc], rel=1e-12)


def test_binary_quantize_packs_signs(spark):
    df = spark.createDataFrame([([0.5, -1.0, 2.0, 0.0, -0.1, 3.0, 0.1, -4.0],)], "v array<float>")
    out = df.select(binary_quantize_udf(F.col("v")).alias("b")).first().b
    assert out == np.packbits([1, 0, 1, 0, 0, 1, 1, 0]).tobytes()
