"""Binary quantization + Hamming scoring kernels.

The reference quantizes each multivector token to sign bits packed into
Postgres ``bit(128)`` (/root/reference/core/vector_store/
multi_vector_store.py:329-346, Rust kernel morphik_rust/src/binary_ops.rs),
then scores with Hamming similarity ``1 − popcount(q⊕d)/bitlen`` inside a
SQL UDF (:287-313).

Two forms here:

- **Relational** (`sign_vector`, `hamming_similarity_expr`): built-in
  expressions on float arrays, used by the oracle-checkable MaxSim path.
  sign-dot identity: for s ∈ {−1,+1}ⁿ, mismatches = (n − s·s')/2, so
  hamming_sim = 1 − mismatches/n = (n + s·s')/(2n).
- **Packed** (`binary_quantize_udf`, `hamming_similarity_packed_udf`):
  Arrow-vectorized pandas UDFs producing/consuming byte-packed sign bits
  (np.packbits), the storage- and compute-efficient path at scale: 32×
  smaller than float32, XOR+popcount scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType

__all__ = [
    "sign_vector",
    "sign_dot",
    "hamming_similarity_expr",
    "binary_quantize_udf",
    "multivector_quantize_udf",
    "hamming_maxsim_packed",
]

# popcount lookup for uint8
_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int32)


def sign_vector(v: Column) -> Column:
    """Float array → ±1.0 sign array (the unpacked view of binary quantization)."""
    return F.transform(v, lambda x: F.when(x > 0.0, F.lit(1.0)).otherwise(F.lit(-1.0)))


def sign_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def hamming_similarity_expr(sign_a: Column, sign_b: Column, dims: int) -> Column:
    """1 − popcount(xor)/dims, expressed over ±1 sign vectors."""
    return (F.lit(float(dims)) + sign_dot(sign_a, sign_b)) / F.lit(2.0 * dims)


@F.pandas_udf(BinaryType())
def binary_quantize_udf(vectors: pd.Series) -> pd.Series:
    """array<float> → packed sign bits (np.packbits(v > 0))."""

    def pack(v):
        if v is None:
            return None
        return np.packbits(np.asarray(v, dtype=np.float32) > 0).tobytes()

    return vectors.map(pack)


@F.pandas_udf(ArrayType(BinaryType()))
def multivector_quantize_udf(multivectors: pd.Series) -> pd.Series:
    """array<array<float>> → one packed-bit value per token vector."""

    def pack_all(mv):
        if mv is None:
            return None
        return [np.packbits(np.asarray(v, dtype=np.float32) > 0).tobytes() for v in mv]

    return multivectors.map(pack_all)


def hamming_maxsim_packed(query_tokens: list[bytes], bitlen: int):
    """Build a pandas UDF scoring packed-bit multivectors against a fixed
    packed query (the reference's max_sim SQL UDF, vectorized).

    score(chunk) = Σ_q max_d (1 − popcount(q ⊕ d)/bitlen)
    """
    q = np.frombuffer(b"".join(query_tokens), dtype=np.uint8).reshape(len(query_tokens), -1)

    @F.pandas_udf("double")
    def score(mvs: pd.Series) -> pd.Series:
        out = np.empty(len(mvs), dtype=np.float64)
        for i, mv in enumerate(mvs):
            if mv is None or len(mv) == 0:
                out[i] = 0.0
                continue
            d = np.frombuffer(b"".join(mv), dtype=np.uint8).reshape(len(mv), -1)
            # xor popcount matrix: (n_q, n_d)
            dists = _POPCOUNT[np.bitwise_xor(q[:, None, :], d[None, :, :])].sum(axis=2)
            sims = 1.0 - dists / float(bitlen)
            out[i] = sims.max(axis=1).sum()
        return pd.Series(out)

    return score
