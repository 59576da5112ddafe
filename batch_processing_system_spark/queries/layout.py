"""Storage-layout operators — Z-order clustering codes (round 6) and
bucketed co-location (round 7).

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
    "r67_bucketed_colocated",
    """
    WITH per_order AS (
        SELECT o_orderkey, o_orderpriority,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderpriority)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(rev) AS DOUBLE) AS total_rev
    FROM per_order
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Bucketed co-located fact join (engine/bucketing.py) — orders "
    "and lineitem are written ONCE as 8-bucket catalog tables hashed "
    "and sorted on their orderkey, then the orderkey equi-join AND "
    "the per-order aggregation both inherit the bucket distribution: "
    "with broadcast off, the physical plan contains ZERO Exchange on "
    "either fact side (asserted in tests/test_bucketing.py; only the "
    "final 5-group priority rollup shuffles). This is the "
    "write-amortized shuffle-elimination layout — at 100 TB the "
    "nightly fact⋈fact shuffle happens once at ingest, never per "
    "query — complementing r25's Z-order data-skipping layout. "
    "Revenue accumulates in DECIMAL (exact at any bucket count / "
    "merge order), one final cast to double. The oracle runs the "
    "identical logical query on the unbucketed tables: bucketing is "
    "pure layout, so the answers must be hash-identical — which is "
    "itself the correctness claim for the layout lane.",
)
def r67_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.bucketing import bucketed_pair

    orders, lineitem = bucketed_pair(spark, sf_dir, n_buckets=8)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev = price * (F.lit(1).cast("decimal(18,2)") - disc)
    per_order = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).alias("rev"))
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("rev").cast("double").alias("total_rev"),
        )
        .orderBy("o_orderpriority")
    )


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
