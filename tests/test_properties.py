"""Property-based tests (hypothesis) for the correctness-bearing kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.chunking import split_text
from morphik_core_spark.functions.embedder import hash_embed

TEXT = st.text(
    alphabet=st.sampled_from(list("ab cd\n.!x")),
    min_size=0,
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(text=TEXT, chunk_size=st.integers(5, 60))
def test_splitter_without_overlap_caps_chunk_size(text, chunk_size):
    chunks = split_text(text, chunk_size=chunk_size, chunk_overlap=0)
    assert all(len(c) <= chunk_size for c in chunks)
    assert all(c for c in chunks)  # never emits empty chunks


@settings(max_examples=200, deadline=None)
@given(text=TEXT, chunk_size=st.integers(5, 60), overlap=st.integers(1, 10))
def test_splitter_overlap_prefix_property(text, chunk_size, overlap):
    plain = split_text(text, chunk_size=chunk_size, chunk_overlap=0)
    overlapped = split_text(text, chunk_size=chunk_size, chunk_overlap=overlap)
    assert len(plain) == len(overlapped)
    for i in range(1, len(overlapped)):
        # chunk i = tail of previous plain chunk + plain chunk i
        assert overlapped[i] == plain[i - 1][-overlap:] + plain[i]


@settings(max_examples=200, deadline=None)
@given(text=TEXT)
def test_splitter_deterministic(text):
    assert split_text(text, 30, 5) == split_text(text, 30, 5)


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=200))
def test_hash_embed_unit_norm_or_zero(text):
    import math

    v = hash_embed(text)
    norm = math.sqrt(sum(x * x for x in v))
    assert abs(norm - 1.0) < 1e-9 or norm == 0.0


@settings(max_examples=100, deadline=None)
@given(
    a=st.text(alphabet=st.sampled_from(list("abc ")), max_size=60),
    b=st.text(alphabet=st.sampled_from(list("abc ")), max_size=60),
)
def test_hash_embed_depends_only_on_token_multiset(a, b):
    # embeddings are order-insensitive over tokens: shuffling words is identity
    tokens_a = a.lower().split()
    shuffled = " ".join(reversed(tokens_a))
    assert hash_embed(a) == hash_embed(shuffled)
    if sorted(tokens_a) != sorted(b.lower().split()):
        pass  # different multisets MAY collide (hashing) — no assertion
