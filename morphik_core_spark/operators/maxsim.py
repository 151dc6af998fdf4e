"""MaxSim late-interaction scoring (ColPali-style multivectors).

Semantics (reference max_sim SQL UDF, /root/reference/core/vector_store/
multi_vector_store.py:287-313; full-precision variant
fast_multivector_store.py:553):

    score(chunk) = Σ_{q ∈ query tokens} max_{d ∈ chunk tokens} sim(q, d)

Two implementations with identical results:

- **Relational** (`maxsim_relational`): posexplode both sides → join →
  groupBy(chunk, q).max → groupBy(chunk).sum. Every step is a built-in
  shuffle-aggregate Catalyst can plan (and the DuckDB oracle can mirror).
  The query side is tiny and broadcast; the heavy side partial-aggregates
  map-side, so the shuffle carries (chunks × q_tokens) rows, not raw pairs.
- **Vectorized** (`maxsim_pandas`): one Arrow batch per partition, numpy
  matmul/einsum per chunk — the production path; ~10-100× less per-row
  overhead, no shuffle at all (scores computed in place).

The binary-quantized variant uses hamming similarity over sign bits; see
functions/quantization.py. Two-stage retrieval (coarse binary → exact
rescore of survivors, reference fast_multivector_store.py:504-608) composes
these: `maxsim_hamming` + limit(N) then `maxsim_*` exact + limit(k).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morphik_core_spark.functions.quantization import hamming_similarity_expr, sign_vector
from morphik_core_spark.functions.vectors import dot

__all__ = ["maxsim_relational", "maxsim_pandas", "maxsim_hamming_relational"]


def _query_tokens_df(df: DataFrame, query_tokens: Sequence[Sequence[float]]) -> DataFrame:
    spark = df.sparkSession
    from morphik_core_spark.plans.literal import values_literal_frame

    rows = [(i, [float(x) for x in tok]) for i, tok in enumerate(query_tokens)]
    return values_literal_frame(
        spark, [("q_idx", "int"), ("qv", "array<double>")], rows
    )


def maxsim_relational(
    multivectors: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    id_cols: Sequence[str] = ("document_id", "chunk_number"),
    mv_col: str = "multivector",
    similarity: str = "dot",
) -> DataFrame:
    """Exact MaxSim as explode → broadcast join → two-level aggregate.

    similarity: 'dot' (full precision) or 'hamming' (sign-bit, the
    binary-quantized scoring in relational form).

    NULL/empty multivectors score 0.0, matching maxsim_pandas —
    posexplode_outer keeps the row as a single null token whose null sim
    aggregates to null and coalesces at the end, so parity costs no extra
    join.
    """
    ids = [F.col(c) for c in id_cols]
    toks = multivectors.select(*ids, F.posexplode_outer(F.col(mv_col)).alias("d_idx", "dv"))
    q = F.broadcast(_query_tokens_df(multivectors, query_tokens))

    dv = F.col("dv").cast("array<double>")
    qv = F.col("qv")
    if similarity == "dot":
        sim = dot(qv, dv)
    elif similarity == "hamming":
        dims = len(query_tokens[0])
        sim = hamming_similarity_expr(sign_vector(qv), sign_vector(dv), dims)
    else:
        raise ValueError(f"unknown similarity '{similarity}'")

    pairs = toks.crossJoin(q).select(*ids, F.col("q_idx"), sim.alias("sim"))
    best = pairs.groupBy(*ids, "q_idx").agg(F.max("sim").alias("best"))
    return best.groupBy(*id_cols).agg(
        F.coalesce(F.sum("best"), F.lit(0.0)).alias("maxsim")
    )


def maxsim_pandas(
    multivectors: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    id_cols: Sequence[str] = ("document_id", "chunk_number"),
    mv_col: str = "multivector",
) -> DataFrame:
    """Exact MaxSim, Arrow-vectorized: no explode, no shuffle."""
    qm = np.asarray([[float(x) for x in t] for t in query_tokens], dtype=np.float64)

    @F.pandas_udf("double")
    def score(mvs: pd.Series) -> pd.Series:
        out = np.empty(len(mvs), dtype=np.float64)
        for i, mv in enumerate(mvs):
            if mv is None or len(mv) == 0:
                out[i] = 0.0
                continue
            dm = np.asarray([np.asarray(v, dtype=np.float64) for v in mv])
            out[i] = (qm @ dm.T).max(axis=1).sum()
        return pd.Series(out)

    return multivectors.select(*[F.col(c) for c in id_cols], score(F.col(mv_col)).alias("maxsim"))


def maxsim_hamming_relational(
    multivectors: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    id_cols: Sequence[str] = ("document_id", "chunk_number"),
    mv_col: str = "multivector",
) -> DataFrame:
    """Binary-quantized MaxSim (sign-bit Hamming), relational form."""
    return maxsim_relational(multivectors, query_tokens, id_cols, mv_col, similarity="hamming")
