"""Multimodal ingest (SURVEY §2.1 S8; north-star "multimodal columns").

Media are opaque ``binary`` columns plus typed metadata, read through
Spark's binaryFile source: content never round-trips through Python
except inside Arrow-batched feature extractors
(functions/multimodal.py). Partitioning note for 100 TB: binaryFile
splits per file; pack small media into larger container files (or use
``recursiveFileLookup`` over a date-partitioned layout) so tasks get
~128 MB of work each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = True
) -> DataFrame:
    """Scan a directory of media files into
    (path, modificationTime, length, content, ext, content_sha256).

    The digest is computed JVM-side (sha2 over the binary column) — the
    exact-dedup key for media, mirroring q45_dedup_exact for text.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    return df.select(
        "path",
        "modificationTime",
        "length",
        "content",
        F.lower(F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
        F.sha2("content", 256).alias("content_sha256"),
    )
