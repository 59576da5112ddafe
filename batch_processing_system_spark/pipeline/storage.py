"""Partition-scoped document storage — the 100 TB upsert path
(SURVEY §7 H2).

The join-rebuild MERGE in ``process.upsert_documents`` rewrites the
whole snapshot; correct, but at 100 TB you only want to touch the
partitions that contain updated keys. This module stores the target
collection hash-bucketed on ``_id`` and merges per-bucket:

    bucket(_id) = pmod(xxhash64(_id), n_buckets)

- updates shuffle only to their buckets,
- unaffected buckets are never read OR written,
- the write uses dynamic partition overwrite, so the swap is atomic
  per-partition on the commit protocol in use (Delta/Iceberg make it
  table-atomic; the expressions are identical).

This is the same layout that makes the J1 result⋈document join
co-located: both sides bucketed on the join key, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .process import upsert_documents

BUCKET_COL = "_bucket"


def bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def write_documents_bucketed(docs: DataFrame, path: str, n_buckets: int = 64) -> None:
    """Initial load: hash-bucket on _id, one partition dir per bucket."""
    (
        docs.withColumn(BUCKET_COL, bucket_of(F.col("_id"), n_buckets))
        .repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def upsert_documents_partitioned(
    spark: SparkSession, path: str, updates: DataFrame, n_buckets: int = 64
) -> list[int]:
    """Partition-scoped MERGE: rewrite only buckets containing updated
    keys. Returns the bucket ids touched (for observability/tests).

    The per-bucket merge reuses the exact ``upsert_documents``
    expressions — scoping is purely a storage concern.

    Atomicity caveat: this reads and dynamically overwrites the same
    path; the window between deleting and rewriting a touched bucket is
    NOT atomic on plain parquet — a job that dies mid-commit can lose
    touched buckets (untouched buckets are never at risk). A table
    format with a commit protocol (Delta/Iceberg) closes that window
    with the same expressions.
    """
    tagged = updates.withColumn(BUCKET_COL, bucket_of(F.col("custom_id"), n_buckets))
    # bounded-collect: distinct bucket ids, at most n_buckets rows
    touched = [r[BUCKET_COL] for r in tagged.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return []

    # Partition pruning: the IN-filter on the partition column means the
    # scan reads only the touched bucket directories.
    docs = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    merged = upsert_documents(docs.drop(BUCKET_COL), tagged.drop(BUCKET_COL))
    # dynamic overwrite only for THIS write: restore the session's
    # previous mode so unrelated writes keep their overwrite semantics
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        (
            merged.withColumn(BUCKET_COL, bucket_of(F.col("_id"), n_buckets))
            .repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return sorted(touched)
