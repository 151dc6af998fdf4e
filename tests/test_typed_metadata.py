"""Typed-metadata normalization semantics (driver-side, no Spark needed).

Coverage model: reference core/tests/unit/test_typed_metadata.py.
"""

from __future__ import annotations

from datetime import UTC, date, datetime
from decimal import Decimal

import pytest

from morphik_core_spark.operators.typed_metadata import (
    TypedMetadataError,
    canonical_type,
    coerce_value,
    infer_type,
    merge_metadata,
    normalize_metadata,
)


def test_canonical_aliases():
    assert canonical_type("int") == "number"
    assert canonical_type("FLOAT") == "number"
    assert canonical_type("timestamp") == "datetime"
    assert canonical_type("bool") == "boolean"
    assert canonical_type("str") == "string"
    assert canonical_type("list") == "array"
    assert canonical_type("map") == "object"
    with pytest.raises(TypedMetadataError):
        canonical_type("fancy")


def test_inference():
    assert infer_type(True) == "boolean"
    assert infer_type(3) == "number"
    assert infer_type(3.5) == "number"
    assert infer_type(Decimal("1.5")) == "decimal"
    assert infer_type("hello") == "string"
    assert infer_type("2024-01-15T10:30:00Z") == "datetime"
    assert infer_type("2024-01-15") == "string"  # date-only strings stay strings
    assert infer_type([1]) == "array"
    assert infer_type({"a": 1}) == "object"
    assert infer_type(None) == "null"


def test_number_coercion():
    assert coerce_value("42", "number") == 42
    assert coerce_value("4.5", "number") == 4.5
    assert coerce_value(Decimal("2.5"), "number") == 2.5
    with pytest.raises(TypedMetadataError):
        coerce_value(float("nan"), "number")
    with pytest.raises(TypedMetadataError):
        coerce_value("abc", "number")
    with pytest.raises(TypedMetadataError):
        coerce_value(True, "number")


def test_decimal_strips_trailing_zeros():
    assert coerce_value("10.500", "decimal") == "10.5"
    assert coerce_value(Decimal("10.000"), "decimal") == "10"
    assert coerce_value(7, "decimal") == "7"


def test_boolean_coercion():
    assert coerce_value("YES", "boolean") is True
    assert coerce_value("off", "boolean") is False
    assert coerce_value(1, "boolean") is True
    with pytest.raises(TypedMetadataError):
        coerce_value("maybe", "boolean")


def test_datetime_preserves_tz_presence():
    naive = coerce_value("2024-01-15T10:30:00", "datetime")
    assert naive == "2024-01-15T10:30:00"
    aware = coerce_value("2024-01-15T10:30:00Z", "datetime")
    assert aware.endswith("+00:00")
    epoch = coerce_value(0, "datetime")
    assert epoch.startswith("1970-01-01")
    assert coerce_value(datetime(2024, 1, 2, tzinfo=UTC), "datetime") == "2024-01-02T00:00:00+00:00"


def test_date_coercion():
    assert coerce_value("2024-06-15T10:00:00", "date") == "2024-06-15"
    assert coerce_value(date(2024, 6, 15), "date") == "2024-06-15"
    with pytest.raises(TypedMetadataError):
        coerce_value("junk", "date")


def test_normalize_infers_and_honors_hints():
    values, types = normalize_metadata(
        {"a": 1, "b": "2024-01-15T10:30:00Z", "c": "10.500", "d": None},
        {"c": "decimal"},
    )
    assert types == {"a": "number", "b": "datetime", "c": "decimal", "d": "null"}
    assert values["c"] == "10.5"
    assert values["d"] is None


def test_normalize_container_mismatch_raises():
    with pytest.raises(TypedMetadataError):
        normalize_metadata({"a": "notalist"}, {"a": "array"})
    with pytest.raises(TypedMetadataError):
        normalize_metadata({"a": [1]}, {"a": "object"})


def test_nested_sanitization():
    values, types = normalize_metadata({"a": [{"ts": datetime(2024, 1, 1)}, Decimal("2.50")]})
    assert values["a"][0]["ts"] == "2024-01-01T00:00:00"
    assert values["a"][1] == "2.5"
    assert types["a"] == "array"


def test_merge_overlays_and_keeps_existing():
    merged, merged_types = merge_metadata(
        {"keep": "x", "upd": 1},
        {"keep": "string", "upd": "number"},
        {"upd": "2024-01-15T10:30:00Z", "new": True},
    )
    assert merged == {"keep": "x", "upd": "2024-01-15T10:30:00+00:00", "new": True}
    assert merged_types == {"keep": "string", "upd": "datetime", "new": "boolean"}
