"""Unit tests for the JSON-Schema contract machinery (SURVEY §5.2 item
2: the spec's "JSON schema validation utility" and "Pydantic model
generation" tests, /root/reference/README.md:168-175)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_processing_system_spark.functions.json_schema import (
    compile_json_schema,
    conformance_predicate,
    make_validator_udf,
    validate_instance,
)


class TestCompiler:
    def test_flat_object(self):
        st = compile_json_schema(
            {"type": "object", "properties": {"a": {"type": "string"}, "n": {"type": "integer"}}}
        )
        assert st == T.StructType(
            [T.StructField("a", T.StringType()), T.StructField("n", T.LongType())]
        )

    def test_nested_object_and_array(self):
        st = compile_json_schema(
            {
                "type": "object",
                "properties": {
                    "tags": {"type": "array", "items": {"type": "string"}},
                    "inner": {"type": "object", "properties": {"x": {"type": "number"}}},
                },
            }
        )
        assert isinstance(st["tags"].dataType, T.ArrayType)
        assert isinstance(st["inner"].dataType, T.StructType)

    def test_accepts_json_string(self):
        st = compile_json_schema('{"type": "object", "properties": {"b": {"type": "boolean"}}}')
        assert st["b"].dataType == T.BooleanType()

    @pytest.mark.parametrize(
        "bad", ["{not json", '{"type": "tuple"}', '"just a string"', '{"properties": 5}']
    )
    def test_rejects_malformed(self, bad):
        with pytest.raises(ValueError):
            compile_json_schema(bad)


SCHEMA = {
    "type": "object",
    "properties": {
        "sentiment": {"type": "string", "enum": ["positive", "negative", "neutral"]},
        "score": {"type": "number", "minimum": 0, "maximum": 1},
        "tokens": {"type": "array", "items": {"type": "integer"}},
    },
    "required": ["sentiment", "score"],
}


class TestValidateInstance:
    def test_valid(self):
        ok, errs = validate_instance(
            json.dumps({"sentiment": "positive", "score": 0.5, "tokens": [1, 2]}), SCHEMA
        )
        assert ok and errs == []

    # Needle tuples: any one matching suffices — the external
    # ``jsonschema`` (when importable) and the built-in subset validator
    # word their messages differently.
    @pytest.mark.parametrize(
        "payload,needles",
        [
            ("not json", ("invalid JSON",)),
            (json.dumps({"score": 0.5}), ("required",)),
            (json.dumps({"sentiment": "meh", "score": 0.5}), ("enum", "is not one of")),
            (json.dumps({"sentiment": "positive", "score": 2}), ("maximum", "less than")),
            (json.dumps({"sentiment": "positive", "score": -1}), ("minimum", "greater than")),
            (json.dumps({"sentiment": "positive", "score": "hi"}), ("number",)),
            (json.dumps({"sentiment": "positive", "score": 0.5, "tokens": ["a"]}), ("integer",)),
            (None, ("null",)),
        ],
    )
    def test_invalid(self, payload, needles):
        ok, errs = validate_instance(payload, SCHEMA)
        assert not ok
        assert any(n in e for e in errs for n in needles), errs


class TestSparkIntegration:
    def test_validator_udf_batches(self, spark):
        rows = [
            (json.dumps({"sentiment": "positive", "score": 0.9}),),
            (json.dumps({"sentiment": "bogus", "score": 0.9}),),
            ("garbage",),
            (None,),
        ]
        df = spark.createDataFrame(rows, "content string")
        out = df.select(make_validator_udf(SCHEMA)(F.col("content")).alias("v")).collect()
        assert [r["v"]["valid"] for r in out] == [True, False, False, False]
        assert any(n in out[1]["v"]["errors"][0] for n in ("enum", "is not one of"))

    def test_conformance_predicate_fast_path(self, spark):
        rows = [
            (json.dumps({"sentiment": "positive", "score": 0.9}),),
            (json.dumps({}),),  # parseable but missing required
            ("garbage",),
        ]
        df = spark.createDataFrame(rows, "content string")
        out = df.select(
            conformance_predicate(F.col("content"), SCHEMA).alias("ok")
        ).collect()
        assert [r["ok"] for r in out] == [True, False, False]
