"""The reference pipeline's result-processing dataflow as a single
composed oracle query (SURVEY §3.3): scan → JSON extract (F5/C1) →
conditional branch (F4) → equi-join to target documents (J1) →
per-document outcome aggregation.

The real pipeline implementation lives in ``pipeline/``; this query
exists so the composed SHAPE — the thing the spec actually computes
per batch — is itself hash-checked against the oracle at every round,
not just its operator pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register


@register(
    "q55_pipeline_shape",
    """
    SELECT d.doc_id,
           CAST(SUM(CASE WHEN e.event_type = 'error'
                           OR CAST(json_extract_string(e.props, '$.k') AS BIGINT) IS NULL
                           OR CAST(json_extract_string(e.props, '$.k') AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           CAST(SUM(CASE WHEN e.event_type <> 'error'
                           AND CAST(json_extract_string(e.props, '$.k') AS BIGINT) <= 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
    FROM events e
    JOIN documents d ON e.event_id % 500 = d.doc_id
    GROUP BY d.doc_id
    """,
    doc="Composed §3.3 dataflow: outcome lines (events) → nested-JSON "
    "content extraction → error/validity branch (the spec's "
    "response-vs-error and schema-conformance split, "
    "/root/reference/README.md:96-102) → join to target docs → "
    "per-document status tallies. One shuffle for the join (doc side "
    "broadcast when dimension-sized) + one for the agg.",
)
def q55_pipeline_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    k = F.get_json_object("props", "$.k").cast("bigint")
    failed = (F.col("event_type") == "error") | k.isNull() | (k > 50)
    e = events.select((F.col("event_id") % 500).alias("join_key"), failed.alias("is_failed"))
    return (
        e.join(F.broadcast(docs.select("doc_id")), e.join_key == F.col("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("is_failed"), 1).otherwise(0)).cast("bigint").alias("n_failed"),
            F.sum(F.when(~F.col("is_failed"), 1).otherwise(0)).cast("bigint").alias("n_completed"),
        )
    )
