"""Object-store semantics for the serving edge (reference
core/storage/base_storage.py:1-80, local_storage.py, s3_storage.py:1-265).

The reference stores ingested source files in an object store and hands
clients presigned download URLs inside ChunkResult
(document_service.py:1720-1738: ``download_url =
storage.get_download_url(bucket, key)``). The engine keeps its TABLES in
parquet; this module supplies the FILE side:

- :class:`LocalObjectStore` — the reference's local_storage.py shape:
  bucket/key directories under a root, ``file://`` download URLs.
- :class:`PresignedStubStore` — the S3 shape with real presigned-URL
  mechanics (deterministic HMAC-SHA256 signature over
  method/bucket/key/expiry, verified by :meth:`verify_url`) but no
  network: the declared boundary for real S3 (boto3 swap-in keeps the
  same four-method surface).

Both implement the same protocol: ``upload(bucket, key, data)``,
``download(bucket, key)``, ``get_download_url(bucket, key, expires_in)``,
``delete(bucket, key)``. `api.MorphikSpark(storage=...)` uses it for
file ingestion and ChunkResult download-URL hydration.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import urllib.parse

__all__ = ["LocalObjectStore", "PresignedStubStore"]


class LocalObjectStore:
    """Files under ``root/bucket/key``; download URLs are file:// paths
    (reference local_storage.py get_download_url)."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _path(self, bucket: str, key: str) -> str:
        # key may contain slashes; resolve inside the root, never outside
        full = os.path.normpath(os.path.join(self.root, bucket, key))
        if not full.startswith(os.path.normpath(self.root) + os.sep):
            raise ValueError(f"key escapes store root: {key!r}")
        return full

    def upload(self, bucket: str, key: str, data: bytes) -> tuple[str, str]:
        p = self._path(bucket, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(data)
        return bucket, key

    def download(self, bucket: str, key: str) -> bytes:
        with open(self._path(bucket, key), "rb") as fh:
            return fh.read()

    def object_size(self, bucket: str, key: str) -> int:
        """Payload size in bytes without reading it (S3 HEAD analog) —
        feeds the app-storage usage rollup."""
        return os.path.getsize(self._path(bucket, key))

    def get_download_url(self, bucket: str, key: str, expires_in: int = 3600) -> str:
        p = self._path(bucket, key)
        if not os.path.exists(p):
            raise FileNotFoundError(p)
        return f"file://{os.path.abspath(p)}"

    def delete(self, bucket: str, key: str) -> None:
        p = self._path(bucket, key)
        if os.path.exists(p):
            os.remove(p)


class PresignedStubStore(LocalObjectStore):
    """LocalObjectStore that issues S3-SHAPED presigned URLs: the payload
    lives locally, but ``get_download_url`` returns
    ``https://<endpoint>/<bucket>/<key>?X-Expires=...&X-Signature=hmac``
    with a real HMAC-SHA256 over (GET, bucket, key, expires) — the
    mechanics a boto3-backed store performs, minus AWS. ``verify_url``
    closes the loop so the contract is testable end-to-end. ``expires``
    is the caller-declared window; with no wall clock dependency the stub
    signs the WINDOW, not an absolute deadline (deterministic for
    oracle-style tests; a real store signs its own timestamps)."""

    def __init__(self, root: str, secret: bytes = b"morphik-spark-stub", endpoint: str = "object.store.local") -> None:
        super().__init__(root)
        self.secret = secret
        self.endpoint = endpoint

    def _sign(self, method: str, bucket: str, key: str, expires_in: int) -> str:
        msg = f"{method}\n{bucket}\n{key}\n{expires_in}".encode()
        return hmac.new(self.secret, msg, hashlib.sha256).hexdigest()

    def get_download_url(self, bucket: str, key: str, expires_in: int = 3600) -> str:
        if not os.path.exists(self._path(bucket, key)):
            raise FileNotFoundError(f"{bucket}/{key}")
        sig = self._sign("GET", bucket, key, expires_in)
        q = urllib.parse.urlencode({"X-Expires": expires_in, "X-Signature": sig})
        return f"https://{self.endpoint}/{bucket}/{urllib.parse.quote(key)}?{q}"

    def verify_url(self, url: str) -> bool:
        """True iff the URL's signature matches its bucket/key/expiry."""
        parsed = urllib.parse.urlparse(url)
        bucket, _, key = parsed.path.lstrip("/").partition("/")
        params = dict(urllib.parse.parse_qsl(parsed.query))
        try:
            expected = self._sign("GET", bucket, urllib.parse.unquote(key), int(params["X-Expires"]))
        except (KeyError, ValueError):
            return False
        return hmac.compare_digest(expected, params.get("X-Signature", ""))
