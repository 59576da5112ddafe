"""Bucketed-table layout — Spark's co-located join/aggregation lever.

Z-order (engine/zorder.py) is the *data-skipping* layout; bucketing is
the *shuffle-elimination* layout: ``bucketBy(N, key)`` hash-partitions
rows into N fixed buckets at WRITE time and records the scheme in the
catalog, so every later equi-join or aggregation on the bucket key
reads the table already hash-distributed — Catalyst drops the
Exchange entirely (tests/test_bucketing.py asserts the plans). At
100 TB this converts the nightly fact⋈fact join from "shuffle 100 TB
twice, every run" into "shuffle once at ingest, never again":
write-amortized co-location, the same contract as Hive bucketed
tables / Iceberg bucket partition transforms.

Sizing rule the helpers encode: bucket count is fixed FOREVER at
write time (it IS the join parallelism for shuffle-free plans), so
pick it for the target scale — ~(table size / 128 MB-512 MB) on a
real cluster — and keep it a power of two so
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` can still
co-locate tables written at different generations (8-bucket ⋈
4-bucket joins by coalescing 2:1 instead of shuffling).

Provenance: EXT (scale posture; the reference spec at
/root/reference/README.md has no storage-layout machinery). The
bucketing metadata lives in the session catalog (in-memory catalog
locally), so ``bucketed_table`` re-registers idempotently per
session while the parquet files persist under spark-warehouse/.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .io import load_table

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_BUCKET_ROOT = os.path.join(_REPO, "spark-warehouse", "bucketed")


def _sf_tag(sf_dir: str) -> str:
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    force: bool = False,
) -> str:
    """(Re)write a testdata table as a bucketed (+ optionally
    sorted-within-bucket) catalog table; returns the table name.

    Idempotent per (table, sf_dir, n_buckets): if the session catalog
    already has the table, the existing registration is reused — the
    write-once/join-forever amortization that is the point of
    bucketing. ``sort_cols`` additionally sorts rows inside each
    bucket file, which lets SortMergeJoin skip its per-task sort too
    (write once, pre-sorted forever).
    """
    name = f"bkt_{table}_{_sf_tag(sf_dir)}_{n_buckets}"
    if not force and spark.catalog.tableExists(name):
        return name
    df = load_table(spark, sf_dir, table)
    if sort_cols:
        # one write task per bucket => exactly one file per bucket.
        # Catalyst only trusts (and propagates) the within-bucket sort
        # order when a bucket is a single file — with several files it
        # would need a merge, so it re-sorts and the sortBy is wasted.
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", os.path.join(_BUCKET_ROOT, name))
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer.saveAsTable(name)
    return name


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """The engine's canonical co-located fact pair: orders and
    lineitem bucketed by their join key (orderkey), sorted within
    buckets, ready for a zero-Exchange SortMergeJoin."""
    ob = bucketed_table(
        spark, sf_dir, "orders", "o_orderkey", n_buckets, sort_cols=("o_orderkey",)
    )
    lb = bucketed_table(
        spark, sf_dir, "lineitem", "l_orderkey", n_buckets, sort_cols=("l_orderkey",)
    )
    return spark.table(ob), spark.table(lb)
