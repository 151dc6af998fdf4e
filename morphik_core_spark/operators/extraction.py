"""Schema-guided structured extraction over document/chunk text.

Reference surface: core/services/morphik_on_the_fly_structured_output.py —
a user schema (string shorthands like "date"/"int", or field dicts with
type/nullable/description/enum/items/properties) is normalized
(:64-152, TYPE_MAP :20-34) into a response schema, an LLM returns JSON,
and the fields land as document metadata.

Spark restatement: the LLM call stays behind the same pluggable
``CompletionModel`` protocol as RAG (operators/rag.py — network models
are driver-configured, a deterministic stub serves tests), and
everything around it is engine-side and typed:

- ``normalize_extraction_schema`` ports the reference's normalization
  semantics (shorthands, date → STRING/date-time, nullable default
  true, OBJECT/ARRAY passthrough with validation).
- ``to_spark_schema`` maps the normalized schema onto Catalyst types so
  the model's JSON lands in REAL typed columns via ``from_json``
  (PERMISSIVE: a malformed model response nulls that row's fields, it
  never fails the job — per-row isolation like every other kernel).
- ``extract_structured`` runs the model as an Arrow-batched UDF and
  expands the parsed struct into columns.

At 100 TB the model call dominates; this keeps everything else —
prompting, parsing, typing, error isolation — in the plan, and the
extraction output is immediately filterable/joinable (typed columns,
not JSON strings).
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from morphik_core_spark.operators.rag import CompletionModel

__all__ = [
    "normalize_extraction_schema",
    "to_spark_schema",
    "build_extraction_prompt",
    "extract_structured",
]

# reference TYPE_MAP (morphik_on_the_fly_structured_output.py:20-34)
_TYPE_MAP = {
    "string": "STRING",
    "str": "STRING",
    "text": "STRING",
    "number": "NUMBER",
    "float": "NUMBER",
    "double": "NUMBER",
    "integer": "NUMBER",
    "int": "NUMBER",
    "boolean": "BOOLEAN",
    "bool": "BOOLEAN",
    "array": "ARRAY",
    "list": "ARRAY",
    "object": "OBJECT",
}

DEFAULT_SYSTEM_PROMPT = (
    "You are a precise metadata extraction assistant. "
    "Only return JSON with the requested fields and use null for missing values."
)


def _normalize_type(value: str | None) -> str:
    if not value:
        return "STRING"
    return _TYPE_MAP.get(value.lower(), value.upper())


def _build_field_definition(raw: Any) -> dict[str, Any]:
    if isinstance(raw, dict):
        raw_type = raw.get("type")
        field_type = _normalize_type(raw_type) if isinstance(raw_type, str) else "STRING"
        field: dict[str, Any] = {"type": field_type, "nullable": bool(raw.get("nullable", True))}
        if raw.get("description") is not None:
            field["description"] = str(raw["description"])
        if field_type == "STRING":
            fmt = raw.get("format")
            if isinstance(fmt, str) and fmt:
                field["format"] = fmt
            elif raw_type and str(raw_type).lower() == "date":
                field["format"] = "date-time"
        if raw.get("enum") is not None:
            field["enum"] = raw["enum"]
        if field_type == "ARRAY" and raw.get("items") is not None:
            field["items"] = raw["items"]
        if field_type == "OBJECT":
            if isinstance(raw.get("properties"), dict):
                field["properties"] = raw["properties"]
            if isinstance(raw.get("required"), list):
                field["required"] = raw["required"]
        return field
    if isinstance(raw, str):
        if raw.lower() == "date":
            return {"type": "STRING", "format": "date-time", "nullable": True}
        return {"type": _normalize_type(raw), "nullable": True}
    return {"type": "STRING", "nullable": True}


def normalize_extraction_schema(schema_input: dict[str, Any]) -> dict[str, Any]:
    """Reference build_morphik_on_the_fly_schema semantics: full schemas
    (with a type key) validate and pass through; simple field mappings
    normalize into an OBJECT schema with ordering preserved."""
    if not isinstance(schema_input, dict):
        raise ValueError("Schema must be a JSON object")
    schema_type_value = schema_input.get("type")
    schema_type = schema_type_value.upper() if isinstance(schema_type_value, str) else None
    if schema_type:
        if schema_type == "OBJECT" and "properties" not in schema_input:
            raise ValueError("Object schemas must include a 'properties' section.")
        if schema_type == "ARRAY" and "items" not in schema_input:
            raise ValueError("Array schemas must include an 'items' definition.")
        return schema_input
    properties = {key: _build_field_definition(raw) for key, raw in schema_input.items()}
    keys = list(schema_input.keys())
    return {"type": "OBJECT", "properties": properties, "required": keys, "propertyOrdering": keys}


def _field_to_spark(field: dict[str, Any]) -> T.DataType:
    ftype = str(field.get("type", "STRING")).upper()
    if ftype == "NUMBER":
        return T.DoubleType()
    if ftype == "BOOLEAN":
        return T.BooleanType()
    if ftype == "ARRAY":
        items = field.get("items")
        return T.ArrayType(_field_to_spark(items) if isinstance(items, dict) else T.StringType())
    if ftype == "OBJECT":
        props = field.get("properties", {})
        return T.StructType(
            [T.StructField(k, _field_to_spark(v if isinstance(v, dict) else {}), True) for k, v in props.items()]
        )
    return T.StringType()


def to_spark_schema(normalized: dict[str, Any]) -> T.StructType:
    """Normalized OBJECT schema → Catalyst StructType for from_json."""
    if str(normalized.get("type", "")).upper() != "OBJECT":
        raise ValueError("only OBJECT schemas produce row-shaped output")
    return T.StructType(
        [
            T.StructField(name, _field_to_spark(f if isinstance(f, dict) else {}), True)
            for name, f in normalized.get("properties", {}).items()
        ]
    )


def build_extraction_prompt(text: str, normalized: dict[str, Any]) -> str:
    return (
        f"{DEFAULT_SYSTEM_PROMPT}\n\nSchema:\n{json.dumps(normalized, sort_keys=True)}"
        f"\n\nDocument:\n{text}\n\nJSON:"
    )


def extract_structured(
    df: DataFrame,
    schema_input: dict[str, Any],
    model: CompletionModel,
    content_col: str = "content",
    prefix: str = "",
) -> DataFrame:
    """text column → typed extraction columns.

    The model runs per Arrow batch; its raw JSON lands in
    ``{prefix}raw_extraction`` and is parsed PERMISSIVEly into typed
    columns — a row whose response isn't valid JSON gets nulls, never an
    error. Column order follows the schema's propertyOrdering.
    """
    normalized = normalize_extraction_schema(schema_input)
    spark_schema = to_spark_schema(normalized)

    model_ref = model  # captured by the UDF closure; must be picklable

    @F.pandas_udf("string")
    def run_model(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            try:
                out.append(model_ref.complete(build_extraction_prompt(t or "", normalized)))
            except Exception:  # noqa: BLE001 — row-level isolation
                out.append(None)
        return pd.Series(out, dtype=object)

    raw_col = f"{prefix}raw_extraction"
    parsed_col = f"{prefix}extracted"
    out = df.withColumn(raw_col, run_model(F.col(content_col))).withColumn(
        parsed_col, F.from_json(F.col(raw_col), spark_schema)
    )
    fields: list[Column] = [
        F.col(f"{parsed_col}.{name}").alias(f"{prefix}{name}") for name in spark_schema.fieldNames()
    ]
    return out.select(*df.columns, raw_col, *fields)
