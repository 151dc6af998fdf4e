"""Structured extraction: schema normalization parity + typed output."""

from __future__ import annotations

import json
import re

import pytest

from morphik_core_spark.operators.extraction import (
    extract_structured,
    normalize_extraction_schema,
    to_spark_schema,
)


def test_normalize_shorthand_fields():
    out = normalize_extraction_schema({"title": "string", "year": "int", "due": "date", "tags": "list"})
    assert out["type"] == "OBJECT"
    assert out["propertyOrdering"] == ["title", "year", "due", "tags"]
    assert out["properties"]["title"] == {"type": "STRING", "nullable": True}
    assert out["properties"]["year"] == {"type": "NUMBER", "nullable": True}
    assert out["properties"]["due"] == {"type": "STRING", "format": "date-time", "nullable": True}
    assert out["properties"]["tags"] == {"type": "ARRAY", "nullable": True}


def test_normalize_dict_fields_and_passthrough():
    out = normalize_extraction_schema(
        {"score": {"type": "float", "nullable": False, "description": "confidence"}}
    )
    f = out["properties"]["score"]
    assert f == {"type": "NUMBER", "nullable": False, "description": "confidence"}

    full = {"type": "OBJECT", "properties": {"a": {"type": "STRING"}}}
    assert normalize_extraction_schema(full) is full  # passthrough unchanged

    with pytest.raises(ValueError):
        normalize_extraction_schema({"type": "OBJECT"})  # no properties
    with pytest.raises(ValueError):
        normalize_extraction_schema({"type": "ARRAY"})  # no items


def test_to_spark_schema_types():
    schema = to_spark_schema(
        normalize_extraction_schema(
            {
                "name": "string",
                "n": "number",
                "flag": "bool",
                "items": {"type": "array", "items": {"type": "number"}},
                "nested": {"type": "object", "properties": {"x": {"type": "string"}}},
            }
        )
    )
    assert schema.simpleString() == (
        "struct<name:string,n:double,flag:boolean,items:array<double>,nested:struct<x:string>>"
    )


def test_extract_structured_typed_columns(spark):
    # deterministic CompletionModel stub, defined locally so cloudpickle
    # ships it by value (test modules aren't importable on executors)
    class RegexExtractor:
        def complete(self, prompt: str, max_tokens=None, temperature=None) -> str:
            doc = prompt.split("Document:\n", 1)[1].rsplit("\n\nJSON:", 1)[0]
            year = re.search(r"\b(19|20)\d{2}\b", doc)
            title = re.search(r"Title: ([^\n]+)", doc)
            if doc.startswith("GARBAGE"):
                return "not json at all"
            return json.dumps(
                {"title": title.group(1) if title else None, "year": int(year.group(0)) if year else None}
            )

    df = spark.createDataFrame(
        [
            (1, "Title: Catalyst Deep Dive\npublished 2018"),
            (2, "no structured info here"),
            (3, "GARBAGE model response incoming 2020"),
        ],
        "doc_id long, content string",
    )
    out = extract_structured(df, {"title": "string", "year": "int"}, RegexExtractor())
    assert out.schema["year"].dataType.typeName() == "double"  # NUMBER → double
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].title == "Catalyst Deep Dive" and rows[1].year == 2018.0
    assert rows[2].title is None and rows[2].year is None
    # malformed model output nulls the row's fields, never fails the job
    assert rows[3].title is None and rows[3].year is None
    assert rows[3].raw_extraction == "not json at all"