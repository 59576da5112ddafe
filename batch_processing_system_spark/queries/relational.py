"""Core relational operators (SURVEY §2.2): projections, filters,
conditional branches, and the full join family (F1-F4, J1-J8, S5).

Reference grounding: the spec's dataflow is scan → validate (filters)
→ anti-join id check → branch on response/error → join results to
target documents → upsert (/root/reference/README.md:57-67,93-102).
Each query here is that semantics on the driver's TPC-H-ish tables.

Scale notes are per-query; the common theme: equi-joins shuffle on
their key unless one side is dimension-sized, in which case we
broadcast explicitly — at 100 TB the broadcast/shuffle decision is the
whole ballgame, and AQE re-checks it from runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..engine.det import bcount, epoch_us
from ..engine.io import load_table
from . import register


@register(
    "q01",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders",
    doc="F1 project — scan+select only; plan must show ReadSchema pruned "
    "to exactly these 4 columns (no I/O for the other 2).",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@register(
    "q02",
    """
    SELECT event_id, event_type FROM events
    WHERE event_type IS NOT NULL AND props IS NOT NULL AND value >= 0
    """,
    doc="F2 structural-validation filter — the spec's envelope checks "
    "(/root/reference/README.md:59-60) as pushed-down predicates.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("event_type").isNotNull() & F.col("props").isNotNull() & (F.col("value") >= 0)
    ).select("event_id", "event_type")


@register(
    "q03",
    "SELECT event_id, user_id FROM events WHERE event_type NOT IN ('error','click')",
    doc="F3 membership filter — active-job selection "
    "`status NOT IN ('completed','failed')` (/root/reference/README.md:82).",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(~F.col("event_type").isin("error", "click")).select(
        "event_id", "user_id"
    )


@register(
    "q04",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'failed'
                WHEN event_type = 'purchase' THEN 'completed'
                ELSE 'in_progress' END AS ai_status
    FROM events
    """,
    doc="F4 conditional branch — the response/error → ai_status state map "
    "(/root/reference/README.md:96-102).",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("failed"))
        .when(F.col("event_type") == "purchase", F.lit("completed"))
        .otherwise(F.lit("in_progress"))
        .alias("ai_status"),
    )


@register(
    "q07",
    """
    SELECT o_orderkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    doc="J1 inner equi join — result line ⋈ target document on custom_id "
    "(/root/reference/README.md:94-95). Fact⋈fact: shuffled hash/SMJ on "
    "the key; AQE picks from runtime sizes.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


@register(
    "q08",
    """
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    doc="J1 broadcast variant — snowflake dims broadcast to every "
    "executor; zero shuffles for the joins at any fact-table scale.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, region = (
        load_table(spark, sf_dir, t) for t in ("customer", "nation", "region")
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "q09",
    """
    SELECT c_custkey FROM customer
    ANTI JOIN orders ON c_custkey = o_custkey
    """,
    doc="J2 left anti join — the spec's custom_id_not_found validation "
    "(/root/reference/README.md:45,67).",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


@register(
    "q10",
    """
    SELECT c_custkey, c_name FROM customer
    SEMI JOIN orders ON c_custkey = o_custkey
    """,
    doc="J3 left semi join — ids that DO exist (validated complement of q09).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q11",
    """
    SELECT c_custkey, COALESCE(o_orderkey, -1) AS o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    doc="J4 left outer join — requests with no result line marked failed "
    "(/root/reference/README.md:105-107).",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("o_orderkey")
    )


@register(
    "q12",
    """
    SELECT n1.n_name AS name_a, n2.n_name AS name_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    doc="J5 theta join — equi part hashes, inequality evaluated as "
    "residual post-match (pure-inequality joins fall back to BNLJ).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1, n2 = nation.alias("n1"), nation.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(F.col("n1.n_name").alias("name_a"), F.col("n2.n_name").alias("name_b"))


@register(
    "q13",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    """,
    doc="J6 range join — equi key + interval residual; hash-match on "
    "orderkey then filter, so it scales like a plain equi join.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    return li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
    ).select("l_orderkey", "l_linenumber")


@register(
    "q14",
    """
    SELECT p.event_id,
           (SELECT MAX(s.event_id) FROM events s
             WHERE s.user_id = p.user_id
               AND s.event_type = 'signup'
               AND CAST(s.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)) AS last_signup_event_id
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="J7 as-of join — per purchase, the latest strictly-earlier signup "
    "of the same user. Spark has no native as-of; implemented as ONE "
    "window pass over events (partition by user, RANGE frame to -1 µs) — "
    "a single shuffle on user_id, no join at all. The oracle's correlated "
    "subquery is decorrelated by DuckDB to the same shape.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        events.withColumn(
            "last_signup_event_id",
            F.max(F.when(F.col("event_type") == "signup", F.col("event_id"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "last_signup_event_id")
    )


@register(
    "q15",
    """
    SELECT r_name, COUNT(*) AS cnt
    FROM region CROSS JOIN nation
    GROUP BY r_name
    """,
    doc="J8 cross join — small dims only; anything larger is a design "
    "error at scale, so no fact table appears here.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation = load_table(spark, sf_dir, "region"), load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).groupBy("r_name").agg(bcount("cnt"))


@register(
    "q23",
    """
    SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
           COALESCE(u.status, b.o_orderstatus) AS status
    FROM orders b
    FULL OUTER JOIN (
        SELECT o_orderkey, 'completed' AS status
        FROM orders WHERE o_orderstatus = 'O'
    ) u ON b.o_orderkey = u.o_orderkey
    """,
    doc="S5 upsert-as-query — the engine-native MERGE used for the "
    "spec's $set/$push document updates (/root/reference/README.md:100-102, "
    "129-138): full-outer join base vs updates, update wins via COALESCE. "
    "At 100 TB this runs partition-scoped (rewrite only matched "
    "partitions) or via Delta MERGE; semantics identical.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus")
    updates = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("u_orderkey"), F.lit("completed").alias("u_status"))
    )
    merged = base.join(updates, base.o_orderkey == updates.u_orderkey, "full_outer")
    return merged.select(
        F.coalesce(base.o_orderkey, updates.u_orderkey).alias("o_orderkey"),
        F.coalesce(updates.u_status, base.o_orderstatus).alias("status"),
    )
