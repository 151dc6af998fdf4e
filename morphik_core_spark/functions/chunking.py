"""Recursive character text splitter — the correctness-bearing chunking op.

Semantics match the reference exactly (Python morphik_parser.py:54-109 and
the Rust kernel morphik_rust/src/chunking.rs:8-47 in /root/reference):

- separators tried in order ["\\n\\n", "\\n", ". ", " ", ""]; "" = per-char
- greedy accumulation of separator-joined parts up to chunk_size
- oversized chunks recurse with the remaining separators
- overlap: prepend the previous chunk's last ``overlap`` characters — at
  the end of EVERY recursion level, exactly like the reference. When a
  merged chunk recurses, its sub-chunks get overlap applied inside the
  recursion AND again by each enclosing level, so overlap compounds with
  recursion depth. Arguably a reference bug, preserved deliberately:
  chunk-content parity with reference-built indexes matters more than
  tidiness (quirk verified against morphik_parser.py:96-107 semantics).
- quirk preserved: the separator is re-appended to every part whose VALUE
  differs from the last part's value (the reference compares values, not
  positions), so a middle part equal to the final part loses its separator.

Defaults chunk_size=6000 overlap=300 (reference morphik.toml:83-84).

Spark integration: a scalar pandas UDF maps text → array of chunks per
Arrow batch; ``posexplode`` assigns chunk_number. Chunking is
embarrassingly parallel — per-document, no shuffle; the explode multiplies
rows in place.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["split_text", "split_text_udf", "chunk_documents", "contextual_chunks", "DEFAULT_SEPARATORS"]

DEFAULT_SEPARATORS = ["\n\n", "\n", ". ", " ", ""]
DEFAULT_CHUNK_SIZE = 6000
DEFAULT_CHUNK_OVERLAP = 300


def split_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Reference-parity recursive split (see module docstring)."""
    seps = DEFAULT_SEPARATORS if separators is None else separators
    return _recurse(text, chunk_size, chunk_overlap, seps)


def _recurse(text: str, chunk_size: int, chunk_overlap: int, separators: list[str]) -> list[str]:
    if len(text) <= chunk_size:
        return [text] if text else []
    if not separators:
        return [text[i : i + chunk_size] for i in range(0, len(text), chunk_size)]

    sep = separators[0]
    parts = text.split(sep) if sep else list(text)

    merged: list[str] = []
    current = ""
    last_value = parts[-1]
    for part in parts:
        # value-comparison quirk preserved from the reference
        piece = part + (sep if sep and part != last_value else "")
        if len(current + piece) > chunk_size:
            if current:
                merged.append(current)
            current = piece
        else:
            current += piece
    if current:
        merged.append(current)

    out: list[str] = []
    for chunk in merged:
        if len(chunk) > chunk_size and len(separators) > 1:
            out.extend(_recurse(chunk, chunk_size, chunk_overlap, separators[1:]))
        else:
            out.append(chunk)
    # per-level overlap (compounds with recursion depth — reference parity,
    # see module docstring). Overlap windows read the PRE-overlap neighbor.
    if chunk_overlap > 0 and len(out) > 1:
        return [
            (out[i - 1][-chunk_overlap:] + c) if i > 0 else c
            for i, c in enumerate(out)
        ]
    return out


def split_text_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: list[str] | None = None,
):
    """Arrow-batched splitter: string column → array<string> of chunks."""

    @F.pandas_udf(ArrayType(StringType()))
    def split(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: split_text(t, chunk_size, chunk_overlap, separators) if t is not None else []
        )

    return split


def contextual_chunks(
    chunks: DataFrame,
    situate: "Callable[[str], str]",
    content_col: str = "content",
) -> DataFrame:
    """Contextual chunking: prepend model-generated situating context to
    each chunk (reference morphik_parser.py:110-195; OFF by default,
    morphik.toml:85).

    ``situate(chunk_text) -> context`` is the LLM boundary — any
    CompletionModel-backed callable (or a deterministic stub in tests).
    Runs as an Arrow-batched UDF so batching/parallelism match the
    embedding stage.
    """

    @F.pandas_udf(StringType())
    def situate_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: f"{situate(t)}\n\n{t}" if t is not None else None)

    return chunks.withColumn(content_col, situate_udf(F.col(content_col)))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "external_id",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """documents → chunks: (document_id, chunk_number, content).

    chunk_number is 0-based contiguous per document (the padding self-join
    depends on this contiguity)."""
    splitter = split_text_udf(chunk_size, chunk_overlap)
    keep = [c for c in df.columns if c not in (text_col,)]
    return (
        df.withColumn("_chunks", splitter(F.col(text_col)))
        .select(*keep, F.posexplode("_chunks").alias("chunk_number", "content"))
        .withColumnRenamed(id_col, "document_id")
    )
