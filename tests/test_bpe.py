"""BPE tokenizer: merge learning on the classic Sennrich corpus, greedy
apply, and the distributed word-count -> train -> tokenize pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.functions.bpe import (
    apply_bpe,
    train_bpe,
    train_bpe_from_df,
    bpe_tokens_udf,
    word_frequencies,
)


def test_sennrich_example_merges():
    # the worked example from the BPE paper (Sennrich et al. 2016 §3.2)
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, 4)
    # es (9) -> est (9) -> est</w> (9) -> lo (7)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]


def test_apply_uses_lowest_rank_first():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert apply_bpe("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert apply_bpe("low", ranks) == ["low", "</w>"]
    # unseen word falls back to characters
    assert apply_bpe("zq", ranks) == ["z", "q", "</w>"]


def test_merge_count_bounded_by_pair_exhaustion():
    merges = train_bpe([("ab", 3)], 100)
    # 'a b </w>' has only 2 mergeable pairs total
    assert len(merges) <= 3


def test_distributed_train_and_tokenize(spark):
    rows = [("low low low low low lower lower newest newest newest newest newest newest widest widest widest",)]
    df = spark.createDataFrame(rows, "text string")
    wf = {r["word"]: r["freq"] for r in word_frequencies(df, "text").collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_df(df, "text", 4)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]

    toks = df.select(bpe_tokens_udf(merges)(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks[:4] == ["lo", "w", "</w>", "lo"]
    # every learned merged symbol that appears is from the merge closure
    symbols = set(toks)
    assert "est</w>" in symbols


def test_trainer_vocab_collect_is_bounded(spark):
    # heavy-tail corpus: 4 head words + 500 distinct hapaxes (the
    # URL/noise tail that would OOM an unbounded driver collect at scale)
    head = "low low low low low lower lower newest newest newest newest newest newest widest widest widest"
    tail = " ".join(f"hapax{i:04d}" for i in range(500))
    df = spark.createDataFrame([(head,), (tail,)], "text string")

    # default min_freq=2 prunes every hapax executor-side -> merges are
    # identical to training on the head corpus alone (Sennrich example)
    merges = train_bpe_from_df(df, "text", 4)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]

    # max_words caps what reaches the driver: top-2 by freq = newest(6),
    # low(5); 'es'/'est' still dominate, then 'n e' from newest alone
    merges2 = train_bpe_from_df(df, "text", 2, min_freq=2, max_words=2)
    exp = train_bpe([("newest", 6), ("low", 5)], 2)
    assert merges2 == exp

    # the cap itself must live in the plan (GlobalLimit), not post-collect
    from morphik_core_spark.functions.bpe import word_frequencies as _wf
    capped = _wf(df, "text").filter(F.col("freq") >= 2).orderBy(
        F.col("freq").desc(), F.col("word").asc()
    ).limit(2)
    assert len(capped.collect()) == 2


def test_tokenizer_is_arrow_batched_not_row_python(spark):
    df = spark.createDataFrame([("a b c",)] * 10, "text string")
    merges = [("a", "b")]
    plan = df.select(bpe_tokens_udf(merges)(F.col("text"))).  _jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
