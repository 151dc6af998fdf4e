"""FDE (MUVERA) encoding: determinism, shape, and pruning recall vs exact
MaxSim — the property that makes the two-stage plan work."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from morphik_core_spark.functions.fde import (
    fde_doc_udf,
    fde_encode_doc,
    fde_encode_query,
    fde_planes,
)

DIMS, K_SIM, REPS = 16, 3, 8


def _corpus(n=200, rng=None):
    # dedicated generator per call — shared-module RNG state would make
    # corpus contents depend on test execution order
    rng = rng or np.random.default_rng(7)
    docs = []
    for _ in range(n):
        n_tok = int(rng.integers(4, 12))
        mv = rng.standard_normal((n_tok, DIMS))
        mv /= np.linalg.norm(mv, axis=1, keepdims=True)
        docs.append(mv)
    return docs


RNG = np.random.default_rng(11)


def _maxsim(q, d):
    return (q @ d.T).max(axis=1).sum()


def test_fde_shape_and_determinism():
    planes = fde_planes(DIMS, K_SIM, REPS)
    mv = RNG.standard_normal((5, DIMS))
    a = fde_encode_doc(mv, planes)
    b = fde_encode_doc(mv, planes)
    assert a == b
    assert len(a) == (1 << K_SIM) * DIMS * REPS


def test_fde_empty_multivector():
    planes = fde_planes(DIMS, K_SIM, REPS)
    assert fde_encode_doc([], planes) == [0.0] * ((1 << K_SIM) * DIMS * REPS)


def test_fde_prune_recall_vs_exact_maxsim():
    planes = fde_planes(DIMS, K_SIM, REPS)
    rng = np.random.default_rng(7)
    docs = _corpus(200, rng)
    q = rng.standard_normal((4, DIMS))
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = np.array([_maxsim(q, d) for d in docs])
    q_fde = np.asarray(fde_encode_query(q, planes))
    approx = np.array([np.dot(q_fde, fde_encode_doc(d, planes)) for d in docs])

    true_top10 = set(np.argsort(-exact)[:10])
    fde_top50 = set(np.argsort(-approx)[:50])
    recall = len(true_top10 & fde_top50) / 10
    # the reference prunes to min(10k, 75) of N then rescores; at 200 docs /
    # candidate budget 50 the FDE approximation must keep most true hits
    assert recall >= 0.8, f"FDE prune recall {recall}"


def test_fde_udf_matches_python(spark):
    docs = _corpus(5)
    planes = fde_planes(DIMS, K_SIM, REPS)
    df = spark.createDataFrame(
        [(i, [[float(x) for x in t] for t in d]) for i, d in enumerate(docs)],
        "id long, mv array<array<double>>",
    )
    got = {r.id: r.fde for r in df.select("id", fde_doc_udf(DIMS, K_SIM, REPS)(F.col("mv")).alias("fde")).collect()}
    for i, d in enumerate(docs):
        assert got[i] == pytest.approx(fde_encode_doc(d, planes), abs=1e-12)
