"""Continuous exact-dedup ingestion (north-star family "dedup" in its
streaming form): documents arrive as JSONL files, each micro-batch
keeps only content never seen before — across batches AND restarts —
and appends survivors to a corpus store.

State is externalized to a parquet digest store (md5 → first doc_id),
the same pattern as the reference's MongoDB-backed job state and our
bucketed document store: the stream engine tracks file offsets, the
store is the dedup memory. At 100 TB the digest store is a bucketed
table joined on the 16-byte digest — shuffle ships digests, never
documents (SCALE.md, exact-dedup row).

Within-batch ties keep the minimum doc_id (deterministic, §2.5 D3);
cross-batch arrivals lose to whatever the store already holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INCOMING_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("keep_id", T.LongType()),
    ]
)


def _read_parquet_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    if os.path.exists(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def dedup_batch(
    spark: SparkSession, batch: DataFrame, digest_path: str
) -> DataFrame:
    """One micro-batch of exact dedup against the persistent digest
    store: hash, drop within-batch copies (min doc_id survives), then
    anti-join the store. Returns the surviving (doc_id, text,
    text_hash) rows and appends their digests to the store."""
    hashed = batch.withColumn("text_hash", F.md5(F.encode("text", "UTF-8")))
    w_min = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    batch_unique = hashed.join(w_min, ["text_hash", "doc_id"])
    seen = _read_parquet_or_empty(spark, digest_path, DIGEST_SCHEMA)
    survivors = batch_unique.join(
        seen.select("text_hash"), "text_hash", "left_anti"
    ).select("doc_id", "text", "text_hash")
    # Materialize before the store append so the anti-join cannot see
    # its own batch's digests mid-write.
    survivors = survivors.localCheckpoint(eager=True)
    (
        survivors.select("text_hash", F.col("doc_id").alias("keep_id"))
        .write.mode("append")
        .parquet(digest_path)
    )
    return survivors


def stream_dedup_documents(
    spark: SparkSession,
    incoming_dir: str,
    corpus_path: str,
    digest_path: str,
    checkpoint: str,
):
    """Wire a JSONL document stream through per-batch exact dedup into
    an append-only corpus. Returns the DataStreamWriter (caller picks
    the trigger — availableNow for catch-up, processingTime for
    continuous ingestion). File offsets live in the checkpoint, so a
    restart neither re-reads files nor re-admits seen content (the
    digest store is the cross-restart memory)."""
    incoming = spark.readStream.schema(INCOMING_DOC_SCHEMA).json(incoming_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = dedup_batch(batch_df.sparkSession, batch_df, digest_path)
        survivors.select("doc_id", "text").write.mode("append").parquet(corpus_path)

    return incoming.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
