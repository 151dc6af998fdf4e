"""Worked real-model embedding adapter (SURVEY §2.8).

The engine's embedding contract is ``embed_column(df, text_col) →
array<double>`` (see functions/embedder.py). The seeded hash embedder keeps
that contract oracle-checkable; this module is the *production* side of the
same contract: an adapter shaped like the reference's LiteLLM embedding
model (reference core/embedding/litellm_embedding.py:14-150) that calls an
external embedding service from inside an Arrow-batched pandas UDF.

Spark-first design points (what makes this survive a 1000-executor cluster):

- **Iterator UDF**: ``Iterator[pd.Series] -> Iterator[pd.Series]`` so the
  client (HTTP session, auth, connection pool) is constructed ONCE per
  Python worker, not once per Arrow batch — the per-batch form would
  re-handshake thousands of times per partition.
- **Sub-batching**: Arrow batches are re-chunked to the provider's request
  limit (reference `_determine_batch_size`: 100 remote / 5 local) so one
  10k-row Arrow batch doesn't become one 10k-text API call.
- **Retries then isolation**: transient provider errors are retried
  (reference passes ``num_retries=3`` to litellm); a sub-batch that still
  fails nulls ONLY its own rows (``on_error="null"``) so one poison batch
  cannot fail a 4-hour stage — or raises (``on_error="raise"``) when the
  pipeline prefers task retry + lineage recompute.
- **No driver round-trips**: nothing here collects; the adapter is a
  column transform, and Spark retries/speculates tasks as usual.

The transport is injected (any ``Callable[[list[str]], list[list[float]]]``
factory), so tests exercise batching/retry/isolation against a fake, and a
real deployment passes a litellm/OpenAI/Ollama-backed transport without
touching engine code.

All three external-model contracts get a worked adapter here:
dense embed (``remote_embed_udf``), ColPali-style multivector
(``remote_multivector_udf`` — feeds operators/maxsim directly), and
cross-encoder rerank (``remote_rerank_kernel`` — plugs into
operators/rerank.make_reranker unchanged).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = [
    "EmbeddingServiceClient",
    "TransientEmbeddingError",
    "remote_embed_udf",
    "embed_column_remote",
    "remote_multivector_udf",
    "remote_rerank_kernel",
    "PGVECTOR_MAX_DIMENSIONS",
]

# Reference clamps stored vectors to pgvector's limit
# (litellm_embedding.py:11, `min(settings.VECTOR_DIMENSIONS, 2000)`).
PGVECTOR_MAX_DIMENSIONS = 2000

_LOCAL_PROVIDER_MARKERS = ("localhost", "127.0.0.1", "host.docker.internal", ":11434")


class TransientEmbeddingError(RuntimeError):
    """Provider error worth retrying (5xx, rate limit, timeout)."""


@dataclass
class EmbeddingServiceClient:
    """LiteLLM-shaped embedding client with an injected transport.

    Mirrors the reference model's config surface
    (litellm_embedding.py:20-95): a model params dict, a local-provider
    heuristic that relaxes auth and shrinks batches, a dimensions clamp,
    and per-request retries. ``transport`` does the actual network call:
    ``transport(texts, model_params) -> list[list[float]]`` and raises
    TransientEmbeddingError for retryable failures.
    """

    transport: Callable[[list[str], dict[str, Any]], list[list[float]]]
    model_name: str = "text-embedding-3-large"
    api_base: str = ""
    dimensions: int = PGVECTOR_MAX_DIMENSIONS
    batch_size: Optional[int] = None  # None -> reference default heuristic
    num_retries: int = 3
    retry_backoff_s: float = 0.0  # tests keep 0; production sets e.g. 0.5
    model_params: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.dimensions = min(self.dimensions, PGVECTOR_MAX_DIMENSIONS)

    @property
    def is_local_provider(self) -> bool:
        base, name = self.api_base.lower(), self.model_name.lower()
        return any(m in base for m in _LOCAL_PROVIDER_MARKERS) or "ollama" in name

    def effective_batch_size(self) -> int:
        if isinstance(self.batch_size, int) and self.batch_size > 0:
            return self.batch_size
        return 5 if self.is_local_provider else 100

    def _request_params(self) -> dict[str, Any]:
        params: dict[str, Any] = {"model": self.model_name, **self.model_params}
        if self.model_name in ("text-embedding-3-large", "azure/text-embedding-3-large"):
            params["dimensions"] = PGVECTOR_MAX_DIMENSIONS
        if self.api_base:
            params["api_base"] = self.api_base
        # local backends still demand *a* key (litellm_embedding.py:74-79)
        if self.is_local_provider and "api_key" not in params:
            params["api_key"] = "dummy-key"
        return params

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        """One provider request with retries; validates dimensions."""
        if not texts:
            return []
        params = self._request_params()
        attempt = 0
        while True:
            try:
                vecs = self.transport(texts, params)
                break
            except TransientEmbeddingError:
                attempt += 1
                if attempt > self.num_retries:
                    raise
                if self.retry_backoff_s:
                    time.sleep(self.retry_backoff_s * attempt)
        if len(vecs) != len(texts):
            raise ValueError(f"provider returned {len(vecs)} embeddings for {len(texts)} texts")
        first = vecs[0] if vecs else None
        is_multivector = bool(first) and isinstance(first[0], (list, tuple))
        if first is not None and not is_multivector and len(first) != self.dimensions:
            # reference warns and keeps going (litellm_embedding.py:86-91);
            # we do the same — dims mismatch is a config problem, not a row
            # problem, and nulling data for it would be worse.
            import warnings

            warnings.warn(
                f"embedding dimension mismatch: got {len(vecs[0])}, expected {self.dimensions}",
                stacklevel=2,
            )
        return vecs


def remote_embed_udf(
    client_factory: Callable[[], EmbeddingServiceClient],
    on_error: str = "null",
):
    """Arrow-batched embedding UDF over an external model client.

    ``client_factory`` runs once per Python worker (iterator UDF), so the
    factory may open HTTP sessions. ``on_error="null"`` nulls the failing
    sub-batch's rows after retries are exhausted; ``"raise"`` propagates
    (Spark then retries the task). Null/empty texts never reach the
    provider and embed to null.
    """
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = client_factory()
        sub = client.effective_batch_size()
        for texts in batches:
            out: list[Optional[list[float]]] = [None] * len(texts)
            # indices of rows worth sending (non-null, non-empty)
            send = [i for i, t in enumerate(texts) if isinstance(t, str) and t.strip()]
            for lo in range(0, len(send), sub):
                idxs = send[lo : lo + sub]
                chunk = [texts.iloc[i] for i in idxs]
                try:
                    vecs = client.embed_batch(chunk)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue  # this sub-batch stays null; others proceed
                for i, v in zip(idxs, vecs):
                    out[i] = [float(x) for x in v]
            yield pd.Series(out)

    return embed


def embed_column_remote(
    df: DataFrame,
    text_col: str,
    client_factory: Callable[[], EmbeddingServiceClient],
    out_col: str = "embedding",
    on_error: str = "null",
) -> DataFrame:
    """The engine's embed_column contract served by an external model."""
    udf = remote_embed_udf(client_factory, on_error=on_error)
    return df.withColumn(out_col, udf(F.col(text_col)))


def remote_multivector_udf(
    client_factory: Callable[[], EmbeddingServiceClient],
    on_error: str = "null",
):
    """ColPali-shaped multivector adapter: text/page column →
    ``array<array<double>>`` (one vector per token/patch, ragged).

    Reference colpali_embedding_model.py:66-320 batches pages through the
    model and returns per-page multivectors; the engine consumes them via
    the MaxSim operators (operators/maxsim.py). Same iterator-UDF shape as
    the dense adapter: one client per worker, provider-limit sub-batching,
    retries, sub-batch failure isolation. The transport returns one
    ``list[list[float]]`` (a token-vectors matrix) PER INPUT; dimension
    validation applies to the inner vectors.
    """
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = client_factory()
        sub = client.effective_batch_size()
        for texts in batches:
            out: list[Optional[list[list[float]]]] = [None] * len(texts)
            send = [i for i, t in enumerate(texts) if isinstance(t, str) and t.strip()]
            for lo in range(0, len(send), sub):
                idxs = send[lo : lo + sub]
                chunk = [texts.iloc[i] for i in idxs]
                try:
                    mats = client.embed_batch(chunk)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                for i, mat in zip(idxs, mats):
                    out[i] = [[float(x) for x in vec] for vec in mat]
            yield pd.Series(out)

    return embed


def remote_rerank_kernel(
    client_factory: Callable[[], EmbeddingServiceClient],
) -> Callable[[str, list[str]], list[float]]:
    """Cross-encoder kernel for operators/rerank.make_reranker backed by an
    external scoring service (reference flag_reranker.py:30-60).

    The transport receives ``[query + SEP + content, ...]`` pair-texts and
    returns one ``[score]`` per pair; retries/batching come from the same
    client. Returns a plain ``(query, contents) -> scores`` callable — the
    exact kernel contract make_reranker already takes, so the Spark side
    (oversample → Arrow rescore → re-sort) is unchanged.
    """

    def kernel(query: str, contents: list[str]) -> list[float]:
        client = client_factory()
        sub = client.effective_batch_size()
        pairs = [f"{query}\x1f{c or ''}" for c in contents]
        scores: list[float] = []
        for lo in range(0, len(pairs), sub):
            vecs = client.embed_batch(pairs[lo : lo + sub])
            scores.extend(float(v[0]) for v in vecs)
        return scores

    return kernel
