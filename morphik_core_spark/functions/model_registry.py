"""Config-selectable model registry for the API facade (SURVEY §3 / M4).

The reference selects its embedding/completion/rerank models from a config
registry (reference morphik.toml:17-56 `registered_models`, consumed by
core/embedding/litellm_embedding.py:20-95): a deployment names a model and
everything downstream resolves through that name. This module is the
facade-side analog: a small spec grammar that `api.MorphikSpark` accepts
as ``embedder=...`` / ``reranker=...`` and resolves into the engine's two
embedding contracts — a driver-side ``text -> vector`` callable (query
embedding at the serving edge) and an Arrow-batched column UDF (corpus
embedding inside the ingest pipeline).

Spec grammar (string or dict):

- ``"hash"`` / ``"hash:<dims>"`` — the seeded deterministic embedder
  (oracle-checkable; the default).
- ``"remote:<api_base>"`` — an OpenAI-compatible ``POST /embeddings``
  endpoint served through :class:`EmbeddingServiceClient` (batching,
  retries, sub-batch failure isolation — functions/model_adapters.py).
- ``{"provider": "remote", "api_base": ..., "model": ...,
  "dimensions": ..., "api_key": ..., "on_error": "null"|"raise"}`` —
  the explicit form of the same.

The HTTP transport is stdlib urllib only (no client library dependency);
it raises :class:`TransientEmbeddingError` for retryable statuses so the
client's retry loop engages, and any other failure propagates to the
adapter's isolation policy.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Callable

from morphik_core_spark.functions.embedder import hash_embed, hash_embed_udf
from morphik_core_spark.functions.model_adapters import (
    EmbeddingServiceClient,
    TransientEmbeddingError,
    remote_embed_udf,
    remote_rerank_kernel,
)

__all__ = [
    "parse_model_spec",
    "http_embedding_transport",
    "build_embedder",
    "build_rerank_kernel",
]

# statuses worth a retry (rate limit, timeout, transient server errors) —
# the reference delegates the same set to litellm's num_retries
_RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})


def parse_model_spec(spec: str | dict[str, Any] | None, default_dims: int = 16) -> dict[str, Any]:
    """Normalize a spec string/dict to ``{"provider": ..., ...}``."""
    if spec is None:
        return {"provider": "hash", "dimensions": default_dims}
    if isinstance(spec, dict):
        out = dict(spec)
        out.setdefault("provider", "hash")
        out.setdefault("dimensions", default_dims)
        return out
    if spec == "hash":
        return {"provider": "hash", "dimensions": default_dims}
    if spec.startswith("hash:"):
        return {"provider": "hash", "dimensions": int(spec.split(":", 1)[1])}
    if spec.startswith("remote:"):
        return {"provider": "remote", "api_base": spec.split(":", 1)[1], "dimensions": default_dims}
    raise ValueError(
        f"unknown model spec {spec!r}; expected 'hash', 'hash:<dims>', "
        "'remote:<api_base>', or a provider dict"
    )


def http_embedding_transport(timeout_s: float = 30.0):
    """OpenAI-compatible embeddings transport for EmbeddingServiceClient.

    ``POST <api_base>/embeddings`` with ``{"model", "input": [texts]}``;
    expects ``{"data": [{"embedding": [...]}, ...]}`` in request order.
    Retryable statuses and socket-level failures raise
    TransientEmbeddingError (the client retries); anything else raises
    plainly (the adapter's on_error policy decides).
    """

    def transport(texts: list[str], params: dict[str, Any]) -> list[list[float]]:
        base = params["api_base"].rstrip("/")
        body = {"model": params.get("model", "embedding"), "input": texts}
        if params.get("dimensions"):
            body["dimensions"] = params["dimensions"]
        req = urllib.request.Request(
            f"{base}/embeddings",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {params['api_key']}"} if params.get("api_key") else {}),
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                payload = json.load(resp)
        except urllib.error.HTTPError as e:
            if e.code in _RETRYABLE_STATUSES:
                raise TransientEmbeddingError(f"embedding service HTTP {e.code}") from e
            raise
        except urllib.error.URLError as e:
            raise TransientEmbeddingError(f"embedding service unreachable: {e.reason}") from e
        rows = sorted(payload["data"], key=lambda d: d.get("index", 0))
        if len(rows) != len(texts):
            raise ValueError(f"embedding service returned {len(rows)} vectors for {len(texts)} texts")
        return [[float(x) for x in r["embedding"]] for r in rows]

    return transport


def _client_factory(cfg: dict[str, Any]) -> Callable[[], EmbeddingServiceClient]:
    """A picklable zero-arg factory closing over plain config only — it is
    shipped to Python workers, so it must not capture sockets/sessions."""

    def factory() -> EmbeddingServiceClient:
        return EmbeddingServiceClient(
            transport=http_embedding_transport(timeout_s=float(cfg.get("timeout_s", 30.0))),
            model_name=cfg.get("model", "embedding"),
            api_base=cfg["api_base"],
            dimensions=int(cfg["dimensions"]) if cfg.get("dimensions") else 2000,
            batch_size=cfg.get("batch_size"),
            num_retries=int(cfg.get("num_retries", 3)),
            retry_backoff_s=float(cfg.get("retry_backoff_s", 0.5)),
            model_params={
                k: cfg[k] for k in ("api_base", "model", "api_key", "dimensions") if cfg.get(k)
            },
        )

    return factory


def build_embedder(
    spec: str | dict[str, Any] | None, default_dims: int = 16
) -> tuple[Callable[[str], list[float]], Any]:
    """Resolve a spec to ``(embed_text, embed_udf)`` — the exact pair
    ``api.MorphikSpark`` consumes. ``embed_text`` serves the driver-side
    query vector (retries included); ``embed_udf`` embeds the corpus
    column inside the ingest pipeline (Arrow-batched, failure-isolated).
    """
    cfg = parse_model_spec(spec, default_dims)
    if cfg["provider"] == "hash":
        dims = int(cfg["dimensions"])
        return (lambda t: hash_embed(t, dims)), hash_embed_udf(dims)
    if cfg["provider"] == "remote":
        if not cfg.get("api_base"):
            raise ValueError("remote embedder spec needs an api_base")
        factory = _client_factory(cfg)

        def embed_text(text: str) -> list[float]:
            return factory().embed_batch([text])[0]

        return embed_text, remote_embed_udf(factory, on_error=cfg.get("on_error", "null"))
    raise ValueError(f"unknown embedder provider {cfg['provider']!r}")


def build_rerank_kernel(spec: str | dict[str, Any] | None):
    """Resolve a spec to a ``(query, contents) -> scores`` kernel for
    operators/rerank.make_reranker; None -> the deterministic
    token-overlap default kernel."""
    if spec is None:
        return None
    cfg = parse_model_spec(spec)
    if cfg["provider"] == "remote":
        if not cfg.get("api_base"):
            raise ValueError("remote reranker spec needs an api_base")
        return remote_rerank_kernel(_client_factory(cfg))
    raise ValueError(f"unknown reranker provider {cfg['provider']!r}")
