"""JSON-Schema contract machinery (SURVEY §2.3 U1/U2; §4.2 custom #2).

The reference validates AI response content against a user-supplied
JSON Schema string (/root/reference/README.md:26,62-63,99) and
generates Pydantic models from it (:171). Spark-first split (SURVEY §7
H1):

- ``compile_json_schema`` (U2): driver-side compiler from the
  expressible subset (type/properties/items) to a ``StructType`` so a
  strict ``from_json`` null-check handles structure validation at
  JVM speed — the fast path, whole-stage-codegen'd.
- ``make_validator_udf`` (U1): Arrow-vectorized pandas UDF for the
  features ``from_json`` cannot express (required/enum/pattern/
  bounds). The slow path; only rows that need those features should
  flow through it.

The validator itself is a self-contained subset implementation used
when the ``jsonschema`` library is absent; when importable (as in this
environment) the real library is preferred, and the subset is
property-tested against it (tests/test_json_schema_property.py):
subset-valid must imply library-valid on the supported vocabulary.
"""

from __future__ import annotations

import json
import re
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

try:  # prefer the real library when present
    import jsonschema as _jsonschema  # type: ignore
except Exception:  # pragma: no cover - absent in this container
    _jsonschema = None

_TYPE_MAP = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def compile_json_schema(schema: dict[str, Any] | str) -> T.DataType:
    """U2: JSON Schema (dict or string) → Spark DataType.

    Covers the structural subset: object/properties, array/items, and
    the four scalar types. Raises ValueError on malformed schemas —
    the spec's "invalid_schema"-style submission-time failure
    (/root/reference/README.md:63).
    """
    if isinstance(schema, str):
        try:
            schema = json.loads(schema)
        except json.JSONDecodeError as exc:
            raise ValueError(f"output_schema_json is not valid JSON: {exc}") from exc
    if not isinstance(schema, dict):
        raise ValueError("JSON Schema must be an object")

    typ = schema.get("type")
    if typ == "object" or (typ is None and "properties" in schema):
        props = schema.get("properties", {})
        if not isinstance(props, dict):
            raise ValueError("'properties' must be an object")
        fields = [
            T.StructField(name, compile_json_schema(sub), nullable=True)
            for name, sub in props.items()
        ]
        return T.StructType(fields)
    if typ == "array":
        return T.ArrayType(compile_json_schema(schema.get("items", {"type": "string"})))
    if typ in _TYPE_MAP:
        return _TYPE_MAP[typ]
    raise ValueError(f"unsupported JSON Schema type: {typ!r}")


def _json_eq(a: Any, b: Any) -> bool:
    """JSON-semantics equality for enum: numbers compare by value
    (1 == 1.0) but booleans are NOT numbers (true != 1, unlike Python
    where ``True == 1``); containers compare element-wise."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(_json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return set(a) == set(b) and all(_json_eq(v, b[k]) for k, v in a.items())
    return a == b


def _validate_subset(value: Any, schema: dict[str, Any], path: str, errors: list[str]) -> None:
    """Minimal JSON-Schema validator: type, required, properties, items,
    enum, pattern, minimum/maximum, minLength/maxLength."""
    typ = schema.get("type")
    if typ == "object":
        if not isinstance(value, dict):
            errors.append(f"{path}: expected object, got {type(value).__name__}")
            return
        for req in schema.get("required", []):
            if req not in value:
                errors.append(f"{path}.{req}: required property missing")
        for name, sub in schema.get("properties", {}).items():
            if name in value:
                _validate_subset(value[name], sub, f"{path}.{name}", errors)
        return
    if typ == "array":
        if not isinstance(value, list):
            errors.append(f"{path}: expected array, got {type(value).__name__}")
            return
        items = schema.get("items")
        if items:
            for i, item in enumerate(value):
                _validate_subset(item, items, f"{path}[{i}]", errors)
        return
    if typ == "string":
        if not isinstance(value, str):
            errors.append(f"{path}: expected string, got {type(value).__name__}")
            return
        if "pattern" in schema and not re.search(schema["pattern"], value):
            errors.append(f"{path}: does not match pattern {schema['pattern']!r}")
        if "minLength" in schema and len(value) < schema["minLength"]:
            errors.append(f"{path}: shorter than minLength {schema['minLength']}")
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            errors.append(f"{path}: longer than maxLength {schema['maxLength']}")
    elif typ == "integer":
        if isinstance(value, bool) or not isinstance(value, int):
            errors.append(f"{path}: expected integer, got {type(value).__name__}")
            return
    elif typ == "number":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            errors.append(f"{path}: expected number, got {type(value).__name__}")
            return
    elif typ == "boolean":
        if not isinstance(value, bool):
            errors.append(f"{path}: expected boolean, got {type(value).__name__}")
            return
    if "enum" in schema and not any(_json_eq(value, e) for e in schema["enum"]):
        errors.append(f"{path}: {value!r} not in enum {schema['enum']!r}")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            errors.append(f"{path}: {value} < minimum {schema['minimum']}")
        if "maximum" in schema and value > schema["maximum"]:
            errors.append(f"{path}: {value} > maximum {schema['maximum']}")


def validate_instance(payload: str | None, schema: dict[str, Any]) -> tuple[bool, list[str]]:
    """Validate one JSON string against the schema; (valid, errors)."""
    if payload is None:
        return False, ["$: content is null"]
    try:
        value = json.loads(payload)
    except json.JSONDecodeError as exc:
        return False, [f"$: invalid JSON: {exc}"]
    if _jsonschema is not None:
        v = _jsonschema.Draft7Validator(schema)
        errs = [f"$.{'.'.join(map(str, e.path))}: {e.message}" for e in v.iter_errors(value)]
        return (not errs), errs
    errors: list[str] = []
    _validate_subset(value, schema, "$", errors)
    return (not errors), errors


_VERDICT_TYPE = T.StructType(
    [
        T.StructField("valid", T.BooleanType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
    ]
)


def make_validator_udf(schema: dict[str, Any] | str):
    """U1: Arrow-vectorized validator. Returns a Column-producing
    callable: ``df.withColumn("verdict", udf(col("content")))`` with
    result type struct<valid:boolean, errors:array<string>>.

    The schema dict is closure-captured and shipped once per executor
    (not per row); batches arrive as Arrow, so the per-row cost is the
    pure-Python validation only.
    """
    schema_dict = json.loads(schema) if isinstance(schema, str) else schema

    @pandas_udf(_VERDICT_TYPE)
    def _validate(contents: pd.Series) -> pd.DataFrame:
        verdicts = [validate_instance(c, schema_dict) for c in contents]
        return pd.DataFrame(
            {"valid": [v for v, _ in verdicts], "errors": [e for _, e in verdicts]}
        )

    return _validate


def conformance_predicate(content: Column, schema: dict[str, Any] | str) -> Column:
    """F6 fast path: strict from_json null-check for the structural
    subset. Rows passing this only need the UDF when the schema uses
    non-structural features."""
    schema_dict = json.loads(schema) if isinstance(schema, str) else schema
    spark_type = compile_json_schema(schema_dict)
    if not isinstance(spark_type, T.StructType):
        raise ValueError("conformance predicate requires an object schema")
    # PERMISSIVE from_json returns an all-NULL struct (not NULL) for
    # malformed input, so parseability must come from try_parse_json's
    # variant parse; required top-level properties are then NULL-checked
    # on the typed parse. Deeper constraints (enum/pattern/bounds) are
    # the UDF path's job.
    pred = F.try_parse_json(content).isNotNull()
    parsed = F.from_json(content, spark_type)
    for req in schema_dict.get("required", []):
        if req in {f.name for f in spark_type.fields}:
            pred = pred & parsed.getField(req).isNotNull()
    return pred
