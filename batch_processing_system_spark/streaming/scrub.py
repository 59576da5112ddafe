"""Continuous PII scrubbing (the streaming form of q90): documents
arrive as JSONL files; every micro-batch has emails and phone-shaped
numbers replaced with typed placeholders before anything lands in the
training corpus — scrub-at-ingest, so raw PII never persists.

The operator is stateless map-side regexp (identical expressions to
the batch catalog entry), so the stream needs no state store, no
watermark, and no foreachBatch — the select streams straight into an
append parquet sink and the scrub fuses into the ingest scan, exactly
as it would into a 100 TB backfill. File offsets live in the stream
checkpoint: a restart re-scrubs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.curation import PII_EMAIL_RE, PII_PHONE_RE
from .dedup import INCOMING_DOC_SCHEMA


def scrub_columns(docs: DataFrame) -> DataFrame:
    """Replace PII in ``text`` and count what was removed — the same
    expressions as q90, applicable to a static OR streaming frame
    (stateless, so Structured Streaming accepts it unchanged)."""
    t1 = F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_replace(t1, PII_PHONE_RE, "<PHONE>").alias("text"),
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(PII_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
    )


def stream_scrub_documents(
    spark: SparkSession,
    incoming_dir: str,
    out_path: str,
    checkpoint: str,
):
    """Wire a JSONL document stream through the PII scrub into an
    append parquet sink. Returns the DataStreamWriter — caller picks
    the trigger (availableNow for catch-up, processingTime for
    continuous ingestion)."""
    incoming = spark.readStream.schema(INCOMING_DOC_SCHEMA).json(incoming_dir)
    return (
        scrub_columns(incoming)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
