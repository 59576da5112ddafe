"""JSONL sources and sinks (SURVEY §2.1 S1/S2/S4).

The reference's unit of exchange is line-delimited JSON: uploaded
request files (/root/reference/README.md:25,57-61), OpenAI result and
error files (:88-90,93-103). JSON Lines is Spark's native JSON format,
so the plain path is just ``spark.read.json``; the line-numbered path
exists because validation errors must report positions
(/root/reference/README.md:46) and ``spark.read.json`` loses them
(SURVEY §7 H6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# read_jsonl_with_lines funnels through a single-partition window for
# exact line numbers — fine for a driver-edge uploaded file, wrong for
# bulk ingest. The guard makes pointing it at something huge an
# explicit error instead of a silent single-core crawl.
MAX_LINE_NUMBERED_BYTES = 256 << 20


def read_jsonl(
    spark: SparkSession, path: str | list[str], schema: T.StructType | None = None
) -> DataFrame:
    """S2: plain JSONL scan — one row per line, permissive nulls so
    response-lines and error-lines coexist in one schema."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_with_lines(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """S1: JSONL scan that keeps 1-based line numbers for per-line error
    reports (/root/reference/README.md:46).

    Reads raw text and parses with ``from_json``; ``line_id`` comes from
    a row_number over ``monotonically_increasing_id`` — valid because
    Spark's text source preserves in-file order and assigns ascending
    ids across a file's splits. Also keeps ``raw`` so jsonl_format_error
    reports can quote the offending line.

    Scale note: the global window makes this a single-partition pass —
    correct for the driver-edge validation of an uploaded request file
    (MBs); for TB-scale line-numbered ingest, numbering would switch to
    a per-file zipWithIndex with per-split offsets. A size guard
    (MAX_LINE_NUMBERED_BYTES) rejects inputs that clearly aren't
    uploaded request files.
    """
    if os.path.isfile(path) and os.path.getsize(path) > MAX_LINE_NUMBERED_BYTES:
        raise ValueError(
            f"read_jsonl_with_lines is for driver-edge uploads; {path!r} is "
            f"{os.path.getsize(path)} bytes (> {MAX_LINE_NUMBERED_BYTES}). "
            "Use read_jsonl (no line numbers) or a per-split numbering scheme."
        )
    raw = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    return raw.select(
        F.row_number().over(w).alias("line_id"),
        F.col("value").alias("raw"),
        F.from_json("value", schema).alias("rec"),
    ).select("line_id", "raw", "rec.*")


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S4: JSONL sink (the validated upload file,
    /root/reference/README.md:74). ``single_file`` coalesces to 1
    partition — driver-edge only, never for at-scale outputs."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
