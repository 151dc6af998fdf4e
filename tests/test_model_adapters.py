"""Worked external-model embedding adapter: batching, retries, failure
isolation, and the local-provider heuristics — network fully mocked.

The fake transports ENCODE what they observed (batch length, position,
attempt count) into the returned vectors, so assertions survive the
driver/executor process boundary.
"""

from __future__ import annotations

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

# The grading/test runner doesn't ship tests/ to Python workers; pickle this
# module's fakes by value so UDF closures referencing them deserialize there.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from morphik_core_spark.functions.model_adapters import (
    PGVECTOR_MAX_DIMENSIONS,
    EmbeddingServiceClient,
    TransientEmbeddingError,
    embed_column_remote,
    remote_embed_udf,
)


def _echo_batch_shape(texts, params):
    # vec = [batch_len, position_in_batch]
    return [[float(len(texts)), float(i)] for i, _ in enumerate(texts)]


class _FlakyTransport:
    """Fails the first `fail_times` calls with a transient error, then
    returns [attempt_count] per text. Worker-local state is fine: the
    iterator UDF builds ONE client per Python worker."""

    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, texts, params):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransientEmbeddingError("503 from provider")
        return [[float(self.calls)] for _ in texts]


def _poison_transport(texts, params):
    if any("poison" in t for t in texts):
        raise TransientEmbeddingError("provider chokes on this batch")
    return [[1.0] for _ in texts]


def _strict_transport(texts, params):
    assert texts, "provider must never see an empty request"
    assert all(isinstance(t, str) and t.strip() for t in texts), (
        "provider must never see null/blank texts"
    )
    return [[float(len(t))] for t in texts]


# ------------------------------------------------------ client unit tests


def test_local_provider_heuristics_match_reference():
    c = EmbeddingServiceClient(transport=_echo_batch_shape, api_base="http://localhost:11434")
    assert c.is_local_provider and c.effective_batch_size() == 5
    assert c._request_params()["api_key"] == "dummy-key"

    c2 = EmbeddingServiceClient(transport=_echo_batch_shape, model_name="ollama/nomic-embed-text")
    assert c2.is_local_provider

    c3 = EmbeddingServiceClient(transport=_echo_batch_shape, api_base="https://api.example.com")
    assert not c3.is_local_provider and c3.effective_batch_size() == 100
    assert "api_key" not in c3._request_params()


def test_dimensions_clamped_to_pgvector_limit():
    c = EmbeddingServiceClient(transport=_echo_batch_shape, dimensions=3072)
    assert c.dimensions == PGVECTOR_MAX_DIMENSIONS
    assert c._request_params()["dimensions"] == PGVECTOR_MAX_DIMENSIONS


def test_retries_then_succeeds_and_exhausts():
    flaky = _FlakyTransport(fail_times=2)
    c = EmbeddingServiceClient(transport=flaky, dimensions=1, num_retries=3)
    assert c.embed_batch(["a", "b"]) == [[3.0], [3.0]]  # 2 failures + 1 success

    dead = _FlakyTransport(fail_times=10)
    c2 = EmbeddingServiceClient(transport=dead, dimensions=1, num_retries=3)
    with pytest.raises(TransientEmbeddingError):
        c2.embed_batch(["a"])
    assert dead.calls == 4  # initial + 3 retries


def test_dimension_mismatch_warns_but_returns():
    c = EmbeddingServiceClient(transport=_echo_batch_shape, dimensions=4)
    with pytest.warns(UserWarning, match="dimension mismatch"):
        vecs = c.embed_batch(["x"])
    assert vecs == [[1.0, 0.0]]


def test_row_count_mismatch_is_an_error():
    c = EmbeddingServiceClient(transport=lambda t, p: [[1.0]], dimensions=1)
    with pytest.raises(ValueError, match="2 texts"):
        c.embed_batch(["a", "b"])


# ------------------------------------------------------ Spark UDF wiring


def test_udf_subbatches_to_provider_limit(spark):
    df = spark.createDataFrame([(i, f"text {i}") for i in range(7)], "id int, t string").coalesce(1)

    def factory():
        return EmbeddingServiceClient(transport=_echo_batch_shape, dimensions=2, batch_size=3)

    rows = embed_column_remote(df, "t", factory).orderBy("id").collect()
    batch_lens = [r.embedding[0] for r in rows]
    positions = [r.embedding[1] for r in rows]
    assert batch_lens == [3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 1.0]
    assert positions == [0.0, 1.0, 2.0, 0.0, 1.0, 2.0, 0.0]


def test_udf_retries_transient_failures(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, t string").coalesce(1)

    def factory():
        return EmbeddingServiceClient(transport=_FlakyTransport(fail_times=2), dimensions=1)

    rows = embed_column_remote(df, "t", factory).orderBy("id").collect()
    assert [r.embedding for r in rows] == [[3.0], [3.0]]


def test_udf_isolates_poison_subbatch(spark):
    data = [(0, "ok 0"), (1, "ok 1"), (2, "poison pill"), (3, "ok 3"), (4, "ok 4")]
    df = spark.createDataFrame(data, "id int, t string").coalesce(1)

    def factory():
        return EmbeddingServiceClient(
            transport=_poison_transport, dimensions=1, batch_size=2, num_retries=0
        )

    rows = embed_column_remote(df, "t", factory, on_error="null").orderBy("id").collect()
    got = {r.id: r.embedding for r in rows}
    # sub-batches of 2: [0,1] ok, [2,3] poisoned -> null, [4] ok
    assert got[0] == [1.0] and got[1] == [1.0] and got[4] == [1.0]
    assert got[2] is None and got[3] is None


def test_udf_on_error_raise_propagates(spark):
    df = spark.createDataFrame([(1, "poison")], "id int, t string")

    def factory():
        return EmbeddingServiceClient(transport=_poison_transport, dimensions=1, num_retries=0)

    with pytest.raises(Exception, match="chokes"):
        embed_column_remote(df, "t", factory, on_error="raise").collect()


def test_udf_null_and_blank_rows_skip_provider(spark):
    data = [(0, "hello"), (1, None), (2, "   "), (3, "world!")]
    df = spark.createDataFrame(data, "id int, t string").coalesce(1)

    def factory():
        return EmbeddingServiceClient(transport=_strict_transport, dimensions=1)

    rows = embed_column_remote(df, "t", factory).orderBy("id").collect()
    got = {r.id: r.embedding for r in rows}
    assert got[0] == [5.0] and got[3] == [6.0]
    assert got[1] is None and got[2] is None


def test_udf_is_a_column_transform_not_a_collect(spark):
    """The adapter composes with ordinary filters/projections lazily."""
    df = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "id int, t string")
    udf = remote_embed_udf(
        lambda: EmbeddingServiceClient(transport=_echo_batch_shape, dimensions=2)
    )
    out = df.filter(F.col("id") < 3).withColumn("e", udf(F.col("t")))
    assert out.count() == 3


# ---------------------------------------------- multivector + rerank


def _multivector_transport(texts, params):
    # one matrix per text: one 2-dim vector per whitespace token (ragged)
    return [[[float(ti), float(len(tok))] for ti, tok in enumerate(t.split())] for t in texts]


def test_multivector_udf_ragged_shapes_and_isolation(spark):
    from morphik_core_spark.functions.model_adapters import remote_multivector_udf

    df = spark.createDataFrame(
        [(0, "one"), (1, "two tokens"), (2, None), (3, "three token text")],
        "id int, t string",
    ).coalesce(1)

    def factory():
        return EmbeddingServiceClient(transport=_multivector_transport, batch_size=2)

    udf = remote_multivector_udf(factory)
    rows = {r.id: r.mv for r in df.withColumn("mv", udf(F.col("t"))).collect()}
    assert [len(v) for v in rows[1]] == [2, 2] and len(rows[1]) == 2  # ragged rows x 2 dims
    assert len(rows[3]) == 3 and rows[3][2] == [2.0, 4.0]
    assert rows[2] is None  # null text never reaches the provider


def test_multivector_feeds_maxsim(spark):
    """The adapter's output schema is exactly what the MaxSim operators eat."""
    from morphik_core_spark.functions.model_adapters import remote_multivector_udf
    from morphik_core_spark.operators.maxsim import maxsim_pandas

    df = spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "alpha alpha")], "doc_id string, t string"
    )
    udf = remote_multivector_udf(
        lambda: EmbeddingServiceClient(transport=_multivector_transport)
    )
    mv = df.withColumn("mv", udf(F.col("t"))).select("doc_id", "mv")
    q = [[0.0, 5.0], [1.0, 4.0]]
    out = maxsim_pandas(mv, q, id_cols=("doc_id",), mv_col="mv")
    got = {r.doc_id: r.maxsim for r in out.collect()}
    assert set(got) == {"d1", "d2"} and all(v is not None for v in got.values())


def test_remote_rerank_kernel_plugs_into_make_reranker(spark):
    from morphik_core_spark.functions.model_adapters import remote_rerank_kernel
    from morphik_core_spark.operators.rerank import make_reranker

    def scoring_transport(pair_texts, params):
        # score = overlap of the query/content halves, one [score] per pair
        out = []
        for p in pair_texts:
            q, c = p.split("\x1f")
            out.append([float(len(set(q.split()) & set(c.split())))])
        return out

    kernel = remote_rerank_kernel(
        lambda: EmbeddingServiceClient(transport=scoring_transport, batch_size=2)
    )
    # driver-side kernel check: batching preserved order
    assert kernel("a b", ["a b", "x", "b c"]) == [2.0, 0.0, 1.0]

    df = spark.createDataFrame(
        [("c1", "spark shuffles data", 0.2), ("c2", "cats purr softly", 0.9)],
        "chunk_id string, content string, score double",
    )
    reranked = make_reranker("spark data", kernel=kernel)(df)
    got = {r.chunk_id: r.score for r in reranked.collect()}
    assert got["c1"] == 2.0 and got["c2"] == 0.0  # model score replaced the prior
