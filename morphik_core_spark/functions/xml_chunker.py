"""Schema-agnostic structural XML chunker.

Behavioral parity with /root/reference/core/parser/xml_chunker.py:26-368:

- profile tag frequencies; unit tag = first preferred present, else the
  least-frequent tag with count in [2, 50] (ignore-list filtered), else
  the most common tag
- one chunk per unit element when it fits the token budget (whitespace
  tokens — the container has no tiktoken, matching the reference fallback)
- oversized elements: greedy child-accumulation parts (`<unit>_part`),
  or sentence-boundary splits for leaf elements (`<unit>_text`)
- breadcrumbs root→element with best-id labels (id/xml:id/ID/name/title
  attrs, else first-3-words slug); prev/next unit ids; source paths
- malformed XML falls back to a single plain-text chunk

Spark integration: one pandas-UDF → posexplode, like the recursive text
splitter. Per-document parallel, no shuffle.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_xml", "chunk_xml_documents", "XML_CHUNK_SCHEMA"]

DEFAULT_MAX_TOKENS = 350
DEFAULT_PREFERRED = ["SECTION", "Section", "Article", "clause"]
DEFAULT_IGNORE = ["TOC", "INDEX"]

XML_CHUNK_SCHEMA = (
    "text string, unit string, xml_id string, breadcrumbs array<string>, "
    "source_path string, prev string, next string"
)


def _tokens(text: str) -> int:
    return len(text.split())


def _best_id(elem: ET.Element) -> str | None:
    for attr in ("id", "xml:id", "ID", "name", "title"):
        if attr in elem.attrib:
            return elem.attrib[attr]
    text = _elem_text(elem)
    if text:
        words = text.split()[:3]
        if words:
            return "_".join(words).replace(" ", "_")
    return None


def _elem_text(elem: ET.Element, max_length: int = 100) -> str:
    parts = []
    if elem.text:
        parts.append(elem.text.strip())
    for child in elem:
        if child.text:
            parts.append(child.text.strip())
        if child.tail:
            parts.append(child.tail.strip())
    full = " ".join(parts).strip()
    return full[:max_length] + "..." if len(full) > max_length else full


def _choose_unit_tag(profile: dict[str, int], preferred: list[str], ignore: list[str]) -> str:
    for tag in preferred:
        if tag in profile:
            return tag
    filtered = {t: c for t, c in profile.items() if t not in ignore}
    if not filtered:
        return next(iter(profile), "root")
    for tag, count in sorted(filtered.items(), key=lambda x: x[1]):
        if 2 <= count <= 50:
            return tag
    return max(filtered.items(), key=lambda x: x[1])[0]


def _breadcrumbs(elem: ET.Element, parents: dict[int, ET.Element], root: ET.Element) -> list[str]:
    path = []
    current: ET.Element | None = elem
    while current is not None and current is not root:
        eid = _best_id(current)
        path.append(f"{current.tag}#{eid}" if eid else current.tag)
        current = parents.get(id(current))
    path.reverse()
    return path


def _sentence_chunks(text: str, max_tokens: int) -> list[str]:
    sentences = text.replace(". ", ".|").replace("! ", "!|").replace("? ", "?|").split("|")
    out, current = [], ""
    for sentence in sentences:
        sentence = sentence.strip()
        if not sentence:
            continue
        candidate = f"{current} {sentence}" if current else sentence
        if _tokens(candidate) <= max_tokens:
            current = candidate
        else:
            if current:
                out.append(current)
            current = sentence
    if current:
        out.append(current)
    return out


def chunk_xml(
    content: bytes | str,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    preferred_unit_tags: list[str] | None = None,
    ignore_tags: list[str] | None = None,
) -> list[dict[str, Any]]:
    """XML bytes/string → chunk dicts (see XML_CHUNK_SCHEMA keys)."""
    preferred = preferred_unit_tags if preferred_unit_tags is not None else DEFAULT_PREFERRED
    ignore = ignore_tags if ignore_tags is not None else DEFAULT_IGNORE
    raw = content.decode("utf-8", errors="ignore") if isinstance(content, bytes) else content

    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return [
            {
                "text": raw,
                "unit": "fallback_text",
                "xml_id": None,
                "breadcrumbs": [],
                "source_path": "fallback",
                "prev": None,
                "next": None,
            }
        ]

    parents = {id(child): parent for parent in root.iter() for child in parent}
    profile: dict[str, int] = {}
    for elem in root.iter():
        profile[elem.tag] = profile.get(elem.tag, 0) + 1
    unit_tag = _choose_unit_tag(profile, preferred, ignore)

    units = root.findall(f".//{unit_tag}") or [root]
    chunks: list[dict[str, Any]] = []
    for i, elem in enumerate(units):
        text = _elem_text(elem, max_length=10000)
        if not text.strip():
            continue
        if _tokens(text) <= max_tokens:
            chunks.append(
                {
                    "text": text,
                    "unit": unit_tag,
                    "xml_id": _best_id(elem),
                    "breadcrumbs": _breadcrumbs(elem, parents, root),
                    "source_path": f"{unit_tag}[{i}]",
                    "prev": units[i - 1].attrib.get("id") if i > 0 else None,
                    "next": units[i + 1].attrib.get("id") if i < len(units) - 1 else None,
                }
            )
        else:
            chunks.extend(_split_large(elem, parents, root, unit_tag, i, max_tokens))
    return chunks


def _split_large(
    elem: ET.Element,
    parents: dict[int, ET.Element],
    root: ET.Element,
    unit_tag: str,
    unit_index: int,
    max_tokens: int,
) -> list[dict[str, Any]]:
    chunks: list[dict[str, Any]] = []

    def part(text: str, kind: str, path: str) -> dict[str, Any]:
        return {
            "text": text.strip(),
            "unit": f"{unit_tag}_{kind}",
            "xml_id": _best_id(elem),
            "breadcrumbs": _breadcrumbs(elem, parents, root),
            "source_path": path,
            "prev": None,
            "next": None,
        }

    if len(elem) > 0:
        current = elem.text.strip() if elem.text and elem.text.strip() else ""
        for child in elem:
            child_text = _elem_text(child, max_length=10000)
            candidate = f"{current}\n{child_text}" if current else child_text
            if _tokens(candidate) <= max_tokens:
                current = candidate
            else:
                if current.strip():
                    chunks.append(part(current, "part", f"{unit_tag}[{unit_index}]_part{len(chunks)}"))
                current = child_text
        if current.strip():
            chunks.append(part(current, "part", f"{unit_tag}[{unit_index}]_part{len(chunks)}"))
    else:
        full = _elem_text(elem, max_length=50000)
        for j, piece in enumerate(_sentence_chunks(full, max_tokens)):
            if piece.strip():
                chunks.append(part(piece, "text", f"{unit_tag}[{unit_index}]_text{j}"))
    return chunks


def chunk_xml_documents(
    df: DataFrame,
    xml_col: str = "text",
    id_col: str = "external_id",
    max_tokens: int = DEFAULT_MAX_TOKENS,
    preferred_unit_tags: list[str] | None = None,
    ignore_tags: list[str] | None = None,
) -> DataFrame:
    """documents with XML bodies → structural chunks
    (document_id, chunk_number, text, unit, xml_id, breadcrumbs, ...)."""

    @F.pandas_udf(f"array<struct<{XML_CHUNK_SCHEMA}>>")
    def run(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            rows = chunk_xml(t, max_tokens, preferred_unit_tags, ignore_tags)
            return [tuple(r[k] for k in ("text", "unit", "xml_id", "breadcrumbs", "source_path", "prev", "next")) for r in rows]

        return texts.map(one)

    return (
        df.withColumn("_chunks", run(F.col(xml_col)))
        .select(F.col(id_col).alias("document_id"), F.posexplode("_chunks").alias("chunk_number", "c"))
        .select("document_id", "chunk_number", "c.*")
    )
