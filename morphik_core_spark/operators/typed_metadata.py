"""Typed-metadata normalization: JSON values + a parallel type-hint map.

The engine stores user metadata as a JSON string column plus a
``metadata_types`` map declaring each top-level field's type; query-time
comparisons are guarded by those hints (see metadata_filters.py). This
module normalizes raw metadata at ingestion: infer or honor declared types,
coerce values to their canonical JSON representation.

Behavioral parity with /root/reference/core/utils/typed_metadata.py
(canonical names :16-41, inference :167-190, coercion :192-331):
- canonical types: string, number, decimal, boolean, datetime, date,
  array, object, null; aliases (int/float/double→number, timestamp→datetime,
  bool→boolean, str/text→string, list→array, dict/map→object)
- decimal stored as a trailing-zero-stripped string
- datetime stored as ISO-8601 (timezone preserved iff present);
  date as ISO date
- true nulls stay null regardless of declared type
- strings that look like ISO datetimes infer as 'datetime'
"""

from __future__ import annotations

import math
from datetime import UTC, date, datetime
from decimal import Decimal, InvalidOperation
from typing import Any

__all__ = [
    "TypedMetadataError",
    "canonical_type",
    "infer_type",
    "coerce_value",
    "normalize_metadata",
    "merge_metadata",
    "SCALAR_TYPES",
    "ALL_TYPES",
]


class TypedMetadataError(ValueError):
    """Raised when a metadata value cannot be coerced to its declared type."""


_ALIASES = {
    **{a: "string" for a in ("string", "str", "text")},
    **{a: "number" for a in ("number", "numeric", "float", "double", "integer", "int")},
    "decimal": "decimal",
    **{a: "boolean" for a in ("bool", "boolean")},
    **{a: "datetime" for a in ("datetime", "timestamp")},
    "date": "date",
    **{a: "array" for a in ("array", "list")},
    **{a: "object" for a in ("object", "dict", "map")},
    "null": "null",
}

SCALAR_TYPES = frozenset({"string", "number", "decimal", "boolean", "datetime", "date", "null"})
ALL_TYPES = SCALAR_TYPES | {"array", "object"}


def canonical_type(name: str, field: str | None = None) -> str:
    canon = _ALIASES.get(name.lower())
    if not canon:
        where = f" for field '{field}'" if field else ""
        raise TypedMetadataError(f"Unsupported metadata type '{name}'{where}.")
    return canon


def _iso_datetime_like(value: str) -> bool:
    """True when a string parses as an ISO-8601 datetime (date AND time part)."""
    if not isinstance(value, str) or len(value) < 19:
        return False
    if value[4] != "-" or value[7] != "-" or value[10] not in ("T", " "):
        return False
    text = value.strip()
    if text.endswith("Z"):
        text = text[:-1] + "+00:00"
    try:
        datetime.fromisoformat(text)
        return True
    except ValueError:
        return False


def infer_type(value: Any) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    if isinstance(value, Decimal):
        return "decimal"
    if isinstance(value, datetime):
        return "datetime"
    if isinstance(value, date):
        return "date"
    if isinstance(value, str):
        return "datetime" if _iso_datetime_like(value) else "string"
    if isinstance(value, list):
        return "array"
    if isinstance(value, dict):
        return "object"
    return "string"


def coerce_value(value: Any, target: str, field: str = "?") -> Any:
    """Coerce ``value`` to the canonical JSON representation of ``target``."""
    if target == "string":
        return value if isinstance(value, str) else str(value)
    if target == "number":
        return _to_number(value, field)
    if target == "decimal":
        return _to_decimal_text(value, field)
    if target == "boolean":
        return _to_boolean(value, field)
    if target == "datetime":
        return _parse_datetime(value, field).isoformat()
    if target == "date":
        return _to_date_text(value, field)
    if target == "array":
        if not isinstance(value, list):
            raise TypedMetadataError(f"Metadata field '{field}' expects an array.")
        return [_sanitize(v, field) for v in value]
    if target == "object":
        if not isinstance(value, dict):
            raise TypedMetadataError(f"Metadata field '{field}' expects an object.")
        return {k: _sanitize(v, field) for k, v in value.items()}
    if target == "null":
        return None
    raise TypedMetadataError(f"Cannot coerce field '{field}' to unsupported metadata type '{target}'.")


def normalize_metadata(
    metadata: dict[str, Any],
    type_hints: dict[str, str] | None = None,
) -> tuple[dict[str, Any], dict[str, str]]:
    """Return (normalized values, type map) for a metadata dict."""
    hints = type_hints or {}
    values: dict[str, Any] = {}
    types: dict[str, str] = {}
    for key, raw in metadata.items():
        if raw is None:
            # true nulls always stay null so callers can clear fields
            values[key], types[key] = None, "null"
            continue
        declared = hints.get(key)
        target = canonical_type(declared, key) if declared else infer_type(raw)
        values[key] = coerce_value(raw, target, key)
        types[key] = target
    return values, types


def merge_metadata(
    existing: dict[str, Any] | None,
    existing_types: dict[str, str] | None,
    updates: dict[str, Any],
    update_type_hints: dict[str, str] | None = None,
) -> tuple[dict[str, Any], dict[str, str]]:
    """Overlay normalized updates onto existing metadata + type maps."""
    new_values, new_types = normalize_metadata(updates, update_type_hints)
    merged = dict(existing or {})
    merged.update(new_values)
    merged_types = dict(existing_types or {})
    merged_types.update(new_types)
    return merged, merged_types


# ------------------------------------------------------------------ private


def _to_number(value: Any, field: str) -> int | float:
    if isinstance(value, bool) or value is None:
        raise TypedMetadataError(f"Metadata field '{field}' cannot coerce boolean/null to number.")
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
            raise TypedMetadataError(f"Metadata field '{field}' cannot store NaN or infinite values.")
        return value
    if isinstance(value, Decimal):
        return float(value)
    if isinstance(value, str):
        text = value.strip().replace("_", "")
        if not text:
            raise TypedMetadataError(f"Metadata field '{field}' cannot coerce empty string to number.")
        try:
            return int(text) if "." not in text and "e" not in text.lower() else float(text)
        except ValueError:
            try:
                return float(text)
            except ValueError as exc:
                raise TypedMetadataError(f"Metadata field '{field}' expects a numeric value.") from exc
    raise TypedMetadataError(f"Metadata field '{field}' expects a numeric value.")


def _to_decimal_text(value: Any, field: str) -> str:
    try:
        if isinstance(value, Decimal):
            dec = value
        elif isinstance(value, (int, float)) and not isinstance(value, bool):
            dec = Decimal(str(value))
        elif isinstance(value, str):
            dec = Decimal(value.strip())
        else:
            raise TypedMetadataError(f"Metadata field '{field}' expects a decimal-compatible value.")
    except (InvalidOperation, ValueError) as exc:
        raise TypedMetadataError(f"Metadata field '{field}' expects a decimal-compatible value.") from exc
    text = format(dec.normalize(), "f")
    if "." in text:
        text = text.rstrip("0").rstrip(".")
    return text or "0"


def _to_boolean(value: Any, field: str) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        lowered = value.strip().lower()
        if lowered in {"true", "1", "yes", "y", "on"}:
            return True
        if lowered in {"false", "0", "no", "n", "off"}:
            return False
        raise TypedMetadataError(f"Metadata field '{field}' expects 'true' or 'false'.")
    if isinstance(value, (int, float)):
        return bool(value)
    raise TypedMetadataError(f"Metadata field '{field}' expects a boolean value.")


def _parse_datetime(value: Any, field: str) -> datetime:
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return datetime.fromtimestamp(float(value), tz=UTC)
    if isinstance(value, str):
        text = value.strip()
        if not text:
            raise TypedMetadataError(f"Metadata field '{field}' expects a datetime value.")
        if text.endswith("Z"):
            text = text[:-1] + "+00:00"
        try:
            return datetime.fromisoformat(text)
        except ValueError as exc:
            raise TypedMetadataError(f"Metadata field '{field}' expects an ISO8601 datetime.") from exc
    raise TypedMetadataError(f"Metadata field '{field}' expects a datetime value.")


def _to_date_text(value: Any, field: str) -> str:
    if isinstance(value, datetime):
        return value.date().isoformat()
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return datetime.fromtimestamp(float(value), tz=UTC).date().isoformat()
    if isinstance(value, str):
        text = value.strip()
        if not text:
            raise TypedMetadataError(f"Metadata field '{field}' expects a date value.")
        try:
            return date.fromisoformat(text.split("T", 1)[0]).isoformat()
        except ValueError as exc:
            raise TypedMetadataError(f"Metadata field '{field}' expects an ISO8601 date.") from exc
    raise TypedMetadataError(f"Metadata field '{field}' expects a date value.")


def _sanitize(value: Any, field: str) -> Any:
    """Make nested containers JSON-serializable (datetimes → ISO strings)."""
    if isinstance(value, dict):
        return {k: _sanitize(v, field) for k, v in value.items()}
    if isinstance(value, list):
        return [_sanitize(v, field) for v in value]
    if isinstance(value, datetime):
        return value.isoformat()
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, Decimal):
        return _to_decimal_text(value, field)
    return value
