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
    "r72_date_partition_prune",
    """
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(COUNT(event_id) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Static partition pruning over the date-partitioned events twin "
    "(engine/partitioning.py; VERDICT r10 item 2 — SURVEY §4.2's "
    "'partition big tables by date at write time'). events is written "
    "ONCE partitioned by event_date = to_date(ts), one directory per "
    "day; the literal 3-day window then prunes at the CATALOG level — "
    "the scan's PartitionFilters drop 27 of 30 day directories before "
    "reading a byte (plan audit asserts the PartitionFilters and "
    "PLANS.md records the 3-of-30 inputFiles delta). The oracle runs "
    "the identical filter on the unpartitioned raw parquet: "
    "partitioning is pure layout, so answers are hash-identical — the "
    "correctness claim for the layout lane, same contract as r67. At "
    "100 TB with a year of history a 3-day dashboard window reads "
    "~1% of the table; without the layout it scans everything, and "
    "no optimizer can recover that after the write.",
)
def r72_date_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.partitioning import partitioned_events

    t = spark.table(partitioned_events(spark, sf_dir))
    return (
        t.filter(
            F.col("event_date").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
            )
        )
        .groupBy("event_date")
        .agg(
            F.count("event_id").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_date")
    )


@register(
    "r73_dpp_join",
    """
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d
        FROM events
        WHERE event_type = 'error' AND DAY(CAST(ts AS DATE)) <= 4
    )
    SELECT CAST(e.ts AS DATE) AS event_date,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events e JOIN days ON CAST(e.ts AS DATE) = days.d
    GROUP BY 1
    ORDER BY 1
    """,
    doc="DYNAMIC partition pruning over the date-partitioned events "
    "twin — the lever static pruning can't reach: the qualifying days "
    "are not a literal but the output of a filtered dimension "
    "derivation (here: days 1-4 that saw an error event), so the "
    "prune must happen at RUNTIME. Catalyst plants a "
    "dynamicpruningexpression subquery in the fact scan's "
    "PartitionFilters, evaluated from the dim side's broadcast "
    "(reuseBroadcastOnly, no extra job), and the fact side reads only "
    "the 4 qualifying day directories of 30 (plan audit asserts the "
    "dynamicpruningexpression; answers hash-identical to the oracle's "
    "unpartitioned self-join by construction). At 100 TB this is the "
    "fact⋈calendar-dim silhouette — 'revenue on promo days' — where "
    "the promo-day list lives in a table, not the query text; DPP is "
    "what keeps it from a full fact scan.",
)
def r73_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.partitioning import partitioned_events

    t = spark.table(partitioned_events(spark, sf_dir))
    days = (
        t.filter(
            (F.col("event_type") == "error") & (F.dayofmonth("event_date") <= 4)
        )
        .select(F.col("event_date").alias("d"))
        .distinct()
    )
    return (
        t.join(days, t.event_date == days.d)
        .groupBy("event_date")
        .agg(
            F.count("event_id").cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_date")
    )


@register(
    "r76_dpp_dim_join",
    """
    WITH dim AS (
        SELECT CAST(DATE '2024-01-01' + i * INTERVAL 1 DAY AS DATE) AS d
        FROM range(30) t(i)
        WHERE DAY(CAST(DATE '2024-01-01' + i * INTERVAL 1 DAY AS DATE)) % 7 = 3
    )
    SELECT CAST(e.ts AS DATE) AS event_date,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events e JOIN dim ON CAST(e.ts AS DATE) = dim.d
    GROUP BY 1
    ORDER BY 1
    """,
    doc="DPP against a genuinely INDEPENDENT dimension (VERDICT r11 "
    "item 3) — the canonical 100 TB silhouette r73 approximates: "
    "'revenue on promo days' where the promo-day list lives in its OWN "
    "table (engine/partitioning.py:calendar_dim, a 30-row calendar "
    "parquet written separately from any fact), not in the query text "
    "and not derived from the fact being pruned. The is_promo filter "
    "on the dim selects 4 of 30 days; Catalyst broadcasts the dim, "
    "plants a dynamicpruningexpression subquery in the partitioned "
    "fact scan's PartitionFilters, and the fact side reads only the 4 "
    "qualifying day directories (plan audit asserts the "
    "dynamicpruningexpression on THIS shape too, so the demo survives "
    "optimizer changes that collapse r73's self-derived subquery). "
    "Oracle: the same 4 promo days generated inline over the "
    "unpartitioned parquet — layout is pure physics, answers "
    "hash-identical. Decimal value sum with one final double cast, "
    "the r72 determinism contract.",
)
def r76_dpp_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.partitioning import calendar_dim, partitioned_events

    t = spark.table(partitioned_events(spark, sf_dir))
    dim = (
        spark.read.parquet(calendar_dim(spark))
        .filter(F.col("promo") == "flash")
        .select("d")
    )
    return (
        t.join(dim, t.event_date == dim.d)
        .groupBy("event_date")
        .agg(
            F.count("event_id").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_date")
    )


@register(
    "r74_hybrid_layout",
    """
    SELECT user_id,
           CAST(COUNT(event_id) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="The COMPOSED storage layout — events partitioned by day AND "
    "bucketed by user_id within each day (engine/partitioning.py:"
    "hybrid_events) — serving a date-windowed per-user rollup with "
    "both levers on ONE plan: the 3-day window prunes 27 of 30 day "
    "directories at the catalog level (PartitionFilters), and the "
    "per-user aggregation consumes the bucket hash distribution with "
    "ZERO hash Exchange (bucket i's one-file-per-day pieces across "
    "the retained days all feed task i; the only Exchange left is "
    "the final ORDER BY's range partition). Plan audit asserts both "
    "properties. This is the canonical events-hypertable layout at "
    "100 TB — time-partitioned for retention + scan locality, "
    "entity-bucketed for shuffle-free rollups — and the answer is "
    "hash-identical to the same SQL on the unpartitioned raw parquet "
    "(layout is pure physics, never semantics).",
)
def r74_hybrid_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.partitioning import hybrid_events

    t = spark.table(hybrid_events(spark, sf_dir))
    return (
        t.filter(
            F.col("event_date").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
            )
        )
        .groupBy("user_id")
        .agg(
            F.count("event_id").cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
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
