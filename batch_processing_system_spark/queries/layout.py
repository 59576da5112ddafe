"""Storage-layout operators — Z-order clustering codes (round 6).

The engine-side machinery lives in engine/zorder.py (morton2 column
builder + zorder_write layout writer, with file-pruning evidence in
tests/test_zorder.py); this module exposes the code computation as an
oracle-checked catalog entry so the bit-interleave itself is
hash-verified against an independently-unrolled SQL twin.

Provenance: EXT (lakehouse data-skipping surface — Delta OPTIMIZE
ZORDER / Iceberg sort orders; the reference spec has no storage-layout
machinery). Name sorts after q50 (driver-window name-freeze).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from ..engine.zorder import morton2, morton2_sql
from . import register

_BITS = 16


@register(
    "r25_zorder",
    f"""
    SELECT l_orderkey,
           l_linenumber,
           l_partkey,
           l_suppkey,
           CAST({morton2_sql('l_partkey', 'l_suppkey', _BITS)} AS BIGINT)
               AS zcode
    FROM lineitem
    ORDER BY zcode, l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Z-order (Morton) clustering code over (l_partkey, l_suppkey) "
    "— the key both engines compute by interleaving the low 16 bits "
    "of each dimension (x even positions, y odd). Spark builds the "
    "32-term shift/mask/or tree JVM-side (one whole-stage-codegen "
    "expression, no UDF); the oracle unrolls the identical formula "
    "as SQL, so the integer codes are hash-exact by construction. "
    "The top-100 scan plans as TakeOrderedAndProject. The POINT of "
    "the code is write-time layout: engine/zorder.zorder_write "
    "clusters files by it, and tests/test_zorder.py measures the "
    "resulting two-dimensional file pruning against footer min/max "
    "stats (single-dimension sort prunes one key and scans "
    "everything for the other; Z-order prunes BOTH at ~sqrt "
    "fan-in).",
)
def r25_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            morton2(F.col("l_partkey"), F.col("l_suppkey"), _BITS).alias("zcode"),
        )
        .orderBy("zcode", "l_orderkey", "l_linenumber")
        .limit(100)
    )
