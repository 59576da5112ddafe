"""Property tests: the self-contained JSON-Schema subset validator vs
the real ``jsonschema`` library (Draft 7), per SURVEY §5.2 item 4.

Contract: on the subset vocabulary (type/properties/required/items/
enum/pattern/minimum/maximum/minLength/maxLength), a subset-VALID
verdict must imply a library-VALID verdict — the subset may only ever
be stricter (it rejects 1.0 as "integer" where draft 7 accepts
zero-fraction floats), never more permissive. A curated matrix then
pins exact agreement on the unambiguous cases.

No Spark needed: this exercises pure-Python validation logic.
"""

from __future__ import annotations

import jsonschema
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.json_schema import _validate_subset


def subset_verdict(value, schema) -> bool:
    errors: list[str] = []
    _validate_subset(value, schema, "$", errors)
    return not errors


def library_verdict(value, schema) -> bool:
    return not list(jsonschema.Draft7Validator(schema).iter_errors(value))


# --- strategies over the supported schema vocabulary -------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-10, 10),
    st.floats(min_value=-10, max_value=10, allow_nan=False, allow_infinity=False),
    st.text(alphabet="ab0", max_size=4),
)

string_schema = st.fixed_dictionaries(
    {"type": st.just("string")},
    optional={
        "minLength": st.integers(0, 4),
        "maxLength": st.integers(0, 6),
        "pattern": st.sampled_from(["^a", "b$", "[0-9]+", "ab"]),
    },
)
numeric_schema = st.fixed_dictionaries(
    {"type": st.sampled_from(["integer", "number"])},
    optional={"minimum": st.integers(-5, 5), "maximum": st.integers(-5, 5)},
)
enum_schema = st.fixed_dictionaries(
    {"enum": st.lists(json_scalars.filter(lambda v: v is not None), min_size=1, max_size=4)}
)
leaf_schema = st.one_of(
    string_schema, numeric_schema, st.just({"type": "boolean"}), enum_schema
)


def _object_schema(children):
    return st.builds(
        lambda props, req: {
            "type": "object",
            "properties": props,
            "required": sorted({r for r in req if r in props}),
        },
        st.dictionaries(st.sampled_from("abcd"), children, max_size=3),
        st.lists(st.sampled_from("abcd"), max_size=3),
    )


schemas = st.recursive(
    leaf_schema,
    lambda children: st.one_of(
        _object_schema(children),
        st.fixed_dictionaries({"type": st.just("array"), "items": children}),
    ),
    max_leaves=6,
)

payloads = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.sampled_from("abcd"), children, max_size=4),
    ),
    max_leaves=8,
)


class TestSubsetSoundness:
    @settings(max_examples=400, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(schema=schemas, value=payloads)
    def test_subset_valid_implies_library_valid(self, schema, value):
        if subset_verdict(value, schema):
            assert library_verdict(value, schema), (
                f"subset accepted what draft7 rejects: value={value!r} schema={schema!r}"
            )

    @settings(max_examples=400, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(schema=schemas, value=payloads)
    def test_library_invalid_cases_are_caught_or_stricter(self, schema, value):
        # contrapositive phrasing of the same soundness property, kept
        # separate so shrinking reports the failing direction clearly
        if not library_verdict(value, schema):
            assert not subset_verdict(value, schema)


EXACT_CASES = [
    # (schema, payload, expected-by-both)
    ({"type": "string", "minLength": 2}, "ab", True),
    ({"type": "string", "minLength": 2}, "a", False),
    ({"type": "string", "pattern": "^a"}, "abc", True),
    ({"type": "string", "pattern": "^a"}, "bac", False),
    ({"type": "integer"}, 3, True),
    ({"type": "integer"}, True, False),  # bool is not an integer
    ({"type": "integer"}, "3", False),
    ({"type": "number", "minimum": 0}, -1, False),
    ({"type": "number", "maximum": 1.5}, 1.4, True),
    ({"enum": [1, "x"]}, 1.0, True),  # JSON numbers: 1 == 1.0
    ({"enum": [1]}, True, False),  # but true != 1
    ({"enum": [True]}, 1, False),
    ({"type": "object", "required": ["a"]}, {}, False),
    ({"type": "object", "required": ["a"]}, {"a": None}, True),
    (
        {"type": "object", "properties": {"a": {"type": "string"}}},
        {"a": 1},
        False,
    ),
    ({"type": "array", "items": {"type": "integer"}}, [1, 2], True),
    ({"type": "array", "items": {"type": "integer"}}, [1, "x"], False),
    ({"type": "array"}, {"a": 1}, False),
]


class TestExactAgreement:
    def test_curated_matrix_agrees_with_library(self):
        for schema, payload, expected in EXACT_CASES:
            assert subset_verdict(payload, schema) is expected, (schema, payload)
            assert library_verdict(payload, schema) is expected, (schema, payload)
