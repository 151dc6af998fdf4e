"""Deterministic seeded hash embedder (FIXTURES.md §6).

Makes retrieval oracle-checkable end-to-end from raw text: the embedding is
a pure function of the token multiset, reproducible in DuckDB SQL because
every step is md5-hex arithmetic.

Definition (dims d, seed s):
    for each whitespace token t of lowercase(text):
        h    = int(md5(f"{s}:{t}")[:15 hex], 16)          # 60-bit
        idx  = h mod d
        sign = +1 if (h // d) mod 2 == 0 else −1
        acc[idx] += sign
    embedding = acc / ||acc||₂     (zero vector stays zero)

Production embedders (LiteLLM dense, ColPali multivector) plug in behind
the same column contract: ``embed_column(df, text_col) → array<float>``.
They are external-model pandas UDFs batched per Arrow batch — see
SURVEY.md §2.8; this module keeps the engine testable without them.

The *relational form* (`hash_embed_components`) returns (id, idx, val)
sparse components — cosine scoring then becomes join-on-idx + aggregate,
which both Spark and the DuckDB oracle express with identical arithmetic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from morphik_core_spark.operators.dedup import normalize_text, portable_hash

__all__ = ["hash_embed", "hash_embed_udf", "hash_embed_components", "DEFAULT_DIMS", "DEFAULT_SEED"]

DEFAULT_DIMS = 16
DEFAULT_SEED = 42


def hash_embed(text: str, dims: int = DEFAULT_DIMS, seed: int = DEFAULT_SEED) -> list[float]:
    """Pure-Python reference implementation."""
    acc = np.zeros(dims, dtype=np.float64)
    for tok in text.lower().split():
        h = int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:15], 16)
        idx = h % dims
        sign = 1.0 if (h // dims) % 2 == 0 else -1.0
        acc[idx] += sign
    norm = float(np.linalg.norm(acc))
    if norm > 0:
        acc /= norm
    return [float(x) for x in acc]


def hash_embed_udf(dims: int = DEFAULT_DIMS, seed: int = DEFAULT_SEED):
    """Arrow-batched embedding UDF: text column → array<double>."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed(t, dims, seed) if t is not None else None)

    return embed


def hash_embed_components(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dims: int = DEFAULT_DIMS,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Sparse UNNORMALIZED embedding components: (id, idx, val).

    val = Σ signs of tokens hashing to idx. Normalization folds into the
    cosine (it cancels in dot/(|a||b|)), so scoring works directly on these.
    Relational: explode tokens → md5 arithmetic → groupBy — every step has
    an exact DuckDB twin.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok")).filter(F.length("tok") > 0)
    h = portable_hash(F.concat(F.lit(f"{seed}:"), F.col("tok")))
    with_h = exploded.select(F.col(id_col), h.alias("h"))
    # `div` = integer division (plain / would route the 60-bit hash through
    # a double and lose precision)
    sign = F.when(F.expr(f"(h div {dims}) % 2") == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        with_h.select(F.col(id_col), (F.col("h") % dims).alias("idx"), sign.alias("sign"))
        .groupBy(id_col, "idx")
        .agg(F.sum("sign").alias("val"))
    )
