"""Nested/JSON extraction and schema conformance (SURVEY §2.2 F5-F6,
§2.3 C1/C6).

Reference grounding: the spec's core extraction is
``response.body.choices[0].message.content`` from result JSONL
(/root/reference/README.md:98) followed by validation against a
user-supplied JSON Schema (:99). The events table's ``props`` JSON
column stands in for the open-shaped payloads.

The full JSON-Schema machinery (StructType compiler + vectorized
validator UDF) lives in ``functions/json_schema.py``; q06 is its
SQL-expressible subset so it stays tier-1 hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register


@register(
    "q05",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="F5/C1 nested JSON extraction — get_json_object on the open "
    "payload; JVM-side Jackson parse, no Python. (The spec's "
    "choices[0].message.content path, /root/reference/README.md:98.)",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "q06",
    """
    SELECT event_id, TRUE AS valid
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 0 AND 50
    """,
    doc="F6 schema-conformance predicate (expressible subset) — the "
    "user-contract check compiled to native predicates "
    "(/root/reference/README.md:99); features beyond from_json go "
    "through the validator UDF (functions/json_schema.py, U1).",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.filter(k.between(0, 50)).select(
        "event_id", F.lit(True).alias("valid")
    )


@register(
    "q70_map_ops",
    """
    SELECT event_id,
           list_sort(json_keys(props)) AS ks,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_k
    FROM events
    """,
    doc="C6 map/struct family — open-shaped JSON payload parsed to a "
    "typed map: map_keys (sorted per D8) + value lookup; the shape of "
    "the spec's dynamic-schema body/context objects "
    "(/root/reference/README.md:59-61,155).",
)
def q70_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        F.array_sort(F.map_keys(m)).alias("ks"),
        F.element_at(m, "k").alias("v_k"),
    )


@register(
    "q76_variant",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    """,
    doc="C1/C6 semi-structured VARIANT path (Spark 4): parse_json into "
    "an open-schema VARIANT once, then typed variant_get extraction — "
    "the engine's answer to schema-on-read JSON at 100 TB, where "
    "binary-encoded variants avoid re-parsing text per access "
    "(shredded columnar storage applies the same expressions). "
    "Filter + derived bucket stay whole-stage-codegen'd.",
)
def q76_variant(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        events.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))
        .filter(F.col("k") >= 50)
    )
