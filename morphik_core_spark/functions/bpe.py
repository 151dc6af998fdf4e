"""Byte-pair-encoding tokenizer: corpus training + distributed apply.

`text_analysis.bpe_token_stats` counts tokens with a GPT-style
pre-tokenizer regex; this module adds the other half a training-data
pipeline needs — LEARNING the subword vocabulary (Sennrich et al. 2016)
and tokenizing the corpus with it.

Training is structured the way real trainers (sentencepiece, HF
tokenizers) are: the corpus-sized work is ONE distributed word-frequency
aggregation (`word_frequencies` — groupBy with map-side combine, output
is vocab-sized by Heaps' law); the merge loop then runs driver-side over
that small table, because each merge step's pair statistics derive from
word frequencies alone, not the corpus. At 100 TB the aggregation is the
only part that touches the data.

Apply is a per-row greedy merge loop — inherently sequential per word,
so it ships as an Arrow-batched pandas UDF (`bpe_tokens_udf`), never a
row-at-a-time Python UDF.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd  # module-top: pandas_udf type-hint inference needs it
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_frequencies",
    "train_bpe",
    "train_bpe_from_df",
    "apply_bpe",
    "bpe_tokens_udf",
]

_END = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the lowercased corpus — the one distributed step
    of BPE training."""
    from morphik_core_spark.operators.dedup import normalize_text

    return (
        df.select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(word_freqs: Iterable[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Deterministic: the most frequent adjacent symbol pair wins each
    round, ties broken lexicographically. Returns the ordered merge list
    (the tokenizer model).
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        vocab[tuple(word) + (_END,)] = vocab.get(tuple(word) + (_END,), 0) + int(freq)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def train_bpe_from_df(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    *,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word counts -> driver-side merge loop.

    The collect is a declared offline-trainer boundary (like
    ``kmeans_fit``), but it must be BOUNDED: on a web-scale corpus the
    distinct-"word" table is billions of rows (URLs, hex blobs, noise).
    Real BPE trainers prune the same way (Sennrich's procedure drops
    hapaxes): rows below ``min_freq`` are filtered executor-side, and at
    most ``max_words`` rows — the most frequent, ties broken by word so
    the cap is deterministic — ever reach the driver. Both pushes happen
    before the collect, so driver memory is O(max_words) regardless of
    corpus size. Tail words pruned here can only contribute pair counts
    below ``min_freq``, which never win a merge round against the head.

    Set ``min_freq=1, max_words=None``-ish (a huge cap) only for small
    fixture corpora where exact parity with the unpruned procedure
    matters.
    """
    wf = word_frequencies(df, text_col)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    # TakeOrdered-shaped cap: per-partition top-N then driver merge —
    # never a full sort, never an unbounded collect.
    rows = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(int(max_words)).collect()
    return train_bpe([(r["word"], r["freq"]) for r in rows], n_merges)


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word: repeatedly merge the lowest-rank adjacent pair
    (the standard greedy BPE apply)."""
    symbols = list(word) + [_END]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_tokens_udf(merges: list[tuple[str, str]]):
    """Factory for an Arrow-batched UDF: text -> array<string> of BPE
    tokens. The merge table rides the closure (few KB — broadcast by
    pickling, the same pattern as the hash-embedder weights)."""
    from pyspark.sql.types import ArrayType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _tokenize(texts: pd.Series) -> pd.Series:
        out = []
        cache: dict[str, list[str]] = {}
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = apply_bpe(w, ranks)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return _tokenize


def tokenize_column(df: DataFrame, text_col: str, merges: list[tuple[str, str]]) -> Column:
    return bpe_tokens_udf(merges)(F.col(text_col))
