"""Config-selectable model registry e2e (VERDICT item 4 / SURVEY M4).

A real local HTTP stub serves an OpenAI-compatible /embeddings endpoint
whose vectors ARE hash_embed — so `MorphikSpark(embedder="remote:...")`
must reproduce the hash-embedder path bit-for-bit end to end (ingest →
retrieve), while exercising the full network adapter stack: urllib
transport, sub-batching, retries, and sub-batch failure isolation, from
inside Spark's Python workers.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from morphik_core_spark.functions.embedder import hash_embed
from morphik_core_spark.functions.model_registry import (
    build_embedder,
    build_rerank_kernel,
    http_embedding_transport,
    parse_model_spec,
)

DIMS = 16


class _StubHandler(BaseHTTPRequestHandler):
    """OpenAI-shaped embeddings endpoint returning hash_embed vectors.

    Texts containing 'POISON' get a 500 (consistently — retries must not
    save them); 'FLAKY' texts fail once then succeed (retries must save
    them). Pair-texts 'q\\x1fc' are scored [overlap] for the rerank path.
    """

    seen_flaky: set[str] = set()
    n_requests = 0

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        texts = body["input"]
        _StubHandler.n_requests += 1
        if any("POISON" in t for t in texts):
            self.send_error(500, "poison batch")
            return
        flaky = [t for t in texts if "FLAKY" in t and t not in _StubHandler.seen_flaky]
        if flaky:
            _StubHandler.seen_flaky.update(flaky)
            self.send_error(503, "transient")
            return
        data = []
        for i, t in enumerate(texts):
            if "\x1f" in t:  # rerank pair-text -> [overlap score]
                q, c = t.split("\x1f", 1)
                qs = set(q.lower().split())
                vec = [len(qs & set(c.lower().split())) / max(len(qs), 1)]
            else:
                vec = hash_embed(t, DIMS)
            data.append({"index": i, "embedding": vec})
        out = json.dumps({"data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def test_parse_model_spec_grammar():
    assert parse_model_spec(None, 8) == {"provider": "hash", "dimensions": 8}
    assert parse_model_spec("hash:32")["dimensions"] == 32
    got = parse_model_spec("remote:http://h:9/v1")
    assert got["provider"] == "remote" and got["api_base"] == "http://h:9/v1"
    with pytest.raises(ValueError, match="spec"):
        parse_model_spec("litellm/gpt")


def test_transport_roundtrip_and_retryable_mapping(stub_server):
    from morphik_core_spark.functions.model_adapters import TransientEmbeddingError

    tr = http_embedding_transport()
    vecs = tr(["hello world", "spark"], {"api_base": stub_server, "model": "m"})
    assert vecs == [hash_embed("hello world", DIMS), hash_embed("spark", DIMS)]
    with pytest.raises(TransientEmbeddingError):
        tr(["POISON"], {"api_base": stub_server, "model": "m"})
    with pytest.raises(TransientEmbeddingError, match="unreachable"):
        tr(["x"], {"api_base": "http://127.0.0.1:9", "model": "m"})


def test_driver_side_embed_retries_transients(stub_server):
    embed_text, _ = build_embedder(
        {"provider": "remote", "api_base": stub_server, "retry_backoff_s": 0.0, "dimensions": DIMS}
    )
    # first attempt 503s, the client's retry succeeds transparently
    assert embed_text("FLAKY driver text") == hash_embed("FLAKY driver text", DIMS)
    assert embed_text("plain text") == hash_embed("plain text", DIMS)


def test_api_remote_embedder_matches_hash_path_e2e(spark, tmp_path, stub_server):
    from morphik_core_spark.api import MorphikSpark

    texts = [
        ("d1", "spark shuffles are the enemy of throughput"),
        ("d2", "broadcast the small side of every join"),
        ("d3", "arrow batches beat row at a time python"),
    ]

    base = MorphikSpark(spark, str(tmp_path / "hashroot"), embed_dims=DIMS)
    remote = MorphikSpark(
        spark,
        str(tmp_path / "remoteroot"),
        embed_dims=DIMS,
        embedder={"provider": "remote", "api_base": stub_server, "retry_backoff_s": 0.0,
                  "dimensions": DIMS},
    )
    id2name = {}
    for api in (base, remote):
        for name, text in texts:
            doc_id = api.ingest_text(text, filename=f"{name}.txt")
            id2name[doc_id] = name

    q = "broadcast join throughput"
    want = [(id2name[r["document_id"]], r["chunk_number"], r["score"]) for r in base.retrieve_chunks(q, k=3)]
    got = [(id2name[r["document_id"]], r["chunk_number"], r["score"]) for r in remote.retrieve_chunks(q, k=3)]
    assert got == want  # exact parity: the stub IS hash_embed over HTTP

    # embeddings at rest match bit-for-bit too (UDF path == driver path)
    base_emb = {
        (id2name[r.document_id], r.chunk_number): r.embedding for r in base.chunks().collect()
    }
    remote_emb = {
        (id2name[r.document_id], r.chunk_number): r.embedding for r in remote.chunks().collect()
    }
    assert remote_emb == base_emb


def test_api_remote_failure_isolation(spark, tmp_path, stub_server):
    from morphik_core_spark.api import MorphikSpark

    api = MorphikSpark(
        spark,
        str(tmp_path / "poisonroot"),
        embed_dims=DIMS,
        embedder={"provider": "remote", "api_base": stub_server, "retry_backoff_s": 0.0,
                  "num_retries": 1, "batch_size": 1, "dimensions": DIMS},
    )
    ok_id = api.ingest_text("healthy document about joins", filename="ok.txt")
    bad_id = api.ingest_text("POISON document the provider rejects", filename="bad.txt")

    names = {ok_id: "ok", bad_id: "bad"}
    emb = {names[r.document_id]: r.embedding for r in api.chunks().collect()}
    # the poisoned row is nulled, the healthy row embedded — one bad
    # sub-batch must never fail the stage
    assert emb["bad"] is None
    assert emb["ok"] == hash_embed("healthy document about joins", DIMS)


def test_remote_rerank_kernel_and_api_wiring(spark, tmp_path, stub_server):
    from morphik_core_spark.api import MorphikSpark
    from morphik_core_spark.operators.rerank import token_overlap_scores

    kernel = build_rerank_kernel(
        {"provider": "remote", "api_base": stub_server, "retry_backoff_s": 0.0}
    )
    q = "broadcast join"
    contents = ["broadcast the join", "unrelated text", ""]
    assert kernel(q, contents) == token_overlap_scores(q, contents)

    api = MorphikSpark(
        spark,
        str(tmp_path / "rerankroot"),
        embed_dims=DIMS,
        reranker={"provider": "remote", "api_base": stub_server, "retry_backoff_s": 0.0},
    )
    r1_id = api.ingest_text("broadcast the join every time", filename="r1.txt")
    api.ingest_text("rows and rows of parquet", filename="r2.txt")
    hits = api.retrieve_chunks("broadcast the join", k=2, use_reranker=True)
    assert hits[0]["document_id"] == r1_id
    assert hits[0]["score"] == 1.0  # exact token overlap via the remote kernel
