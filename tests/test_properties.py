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
    # Overlap is applied per recursion level (reference parity), so deep
    # chunks carry compounded prefixes. The invariants that survive:
    # chunk count is overlap-independent, the first chunk is untouched,
    # every chunk still ENDS with its no-overlap counterpart, and the
    # final prepend is the previous chunk's tail.
    plain = split_text(text, chunk_size=chunk_size, chunk_overlap=0)
    overlapped = split_text(text, chunk_size=chunk_size, chunk_overlap=overlap)
    assert len(plain) == len(overlapped)
    if overlapped:
        assert overlapped[0] == plain[0]
    for i in range(1, len(overlapped)):
        assert overlapped[i].endswith(plain[i])
        if len(plain[i - 1]) >= overlap:
            assert overlapped[i].startswith(plain[i - 1][-overlap:])


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


# ---------------------------------------------- filter compiler robustness

_FIELDS = st.sampled_from(["department", "priority", "tags", "score", "missing"])
_SCALARS = st.one_of(st.integers(-5, 100), st.booleans(), st.sampled_from(["eng", "x", "3"]), st.none())


def _leaf():
    op_block = st.one_of(
        st.fixed_dictionaries({"$eq": _SCALARS.filter(lambda v: v is not None)}),
        st.fixed_dictionaries({"$gte": st.integers(-5, 100)}),
        st.fixed_dictionaries({"$in": st.lists(_SCALARS, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"$exists": st.booleans()}),
        st.fixed_dictionaries({"$contains": st.sampled_from(["en", "x"])}),
        st.fixed_dictionaries({"$regex": st.sampled_from(["^e", "x$"])}),
    )
    return st.builds(lambda f, v: {f: v}, _FIELDS, st.one_of(_SCALARS, op_block))


_FILTER_TREES = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.builds(lambda xs: {"$and": xs}, st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda xs: {"$or": xs}, st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda xs: {"$nor": xs}, st.lists(children, min_size=1, max_size=2)),
        st.builds(lambda x: {"$not": x}, children),
    ),
    max_leaves=6,
)


@settings(max_examples=60, deadline=None)
@given(tree=_FILTER_TREES)
def test_random_filter_trees_compile(spark, tree):
    """Any structurally-valid filter tree must compile to a Column without
    raising (numeric-operand guards may legitimately reject some leaves —
    InvalidMetadataFilterError is the only acceptable failure)."""
    from morphik_core_spark.operators.metadata_filters import (
        InvalidMetadataFilterError,
        MetadataFilterCompiler,
    )

    try:
        col = MetadataFilterCompiler().compile(tree)
    except InvalidMetadataFilterError:
        return
    assert col is not None


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
