"""Composite analytics queries — TPC-H-shaped multi-join pipelines
(Q3/Q5/Q10 silhouettes adapted to the driver's schema subset).

These are the "real workload" shapes: 3-5 table joins + filtered scans
+ DECIMAL-disciplined aggregation + ordered top-k, exercising join
ordering, broadcast selection, and partial aggregation together. At
100 TB each is: broadcast dims, one shuffle per fact-fact join key,
one for the final group — the plan audit keeps them honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.det import bcount, dsum
from ..engine.io import load_table
from . import register

REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col():
    # exact: cast both factors to DECIMAL before multiplying so the
    # product is DECIMAL arithmetic end-to-end (D1)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return price * (F.lit(1).cast("decimal(18,2)") - disc)


@register(
    "q64_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND l_shipdate > o_orderdate
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 silhouette — segment-filtered customer ⋈ orders ⋈ "
    "lineitem, revenue agg, top-10. Filters push to the scans; the "
    "segment filter prunes customers before the join (Catalyst "
    "reorders), revenue stays DECIMAL until the final cast.",
)
def q64_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    joined = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderpriority")
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q65_region_volume",
    """
    SELECT r_name,
           n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS volume,
           COUNT(*) AS n_lines
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
    doc="TPC-H Q5 silhouette — 5-table snowflake rollup: two broadcast "
    "dim joins (region, nation) + two fact joins + grouped revenue. "
    "The canonical plan-shape test: every dim must broadcast, facts "
    "shuffle once each on their join key.",
)
def q65_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, orders, li = (
        load_table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem")
    )
    joined = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(_revenue_col()).cast("double").alias("volume"), bcount("n_lines")
    )


@register(
    "q66_returned_value",
    """
    SELECT c_custkey,
           c_name,
           n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS lost_revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 silhouette — returned-item revenue per customer, "
    "top-20. The returnflag filter pushes into the lineitem scan "
    "(row-group dictionary skip at real scale).",
)
def q66_returned_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "nation", "orders", "lineitem")
    )
    joined = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_col()).cast("double").alias("lost_revenue"))
        .select("c_custkey", "c_name", "n_name", "lost_revenue")
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_TRADE_NATIONS = ["NATION_0", "NATION_1", "NATION_2", "NATION_3"]


@register(
    "r30_nation_volume",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(YEAR(CAST(l_shipdate AS TIMESTAMP)) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE sn.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      AND cn.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 silhouette — cross-border trade volume among a "
    "four-nation bloc by ship year, each directed pair a row. Six-table join where "
    "nation appears TWICE under different roles (supplier side / "
    "customer side): both nation joins and supplier broadcast, the "
    "fact-fact joins shuffle once each, and the nation-pair "
    "predicate prunes before the group. DECIMAL revenue end-to-end "
    "(the q64 discipline).",
)
def r30_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, customer, nation, supplier = (
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "nation", "supplier")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .where(
            F.col("supp_nation").isin(_TRADE_NATIONS)
            & F.col("cust_nation").isin(_TRADE_NATIONS)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_revenue_col()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "r31_market_share",
    """
    WITH econ AS (
        SELECT YEAR(CAST(l_shipdate AS TIMESTAMP)) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   AS rev,
               (sn.n_name = 'NATION_0') AS is_target
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE p_type = 'ECONOMY'
    )
    SELECT CAST(l_year AS INT) AS l_year,
           CAST(SUM(CASE WHEN is_target THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS target_rev,
           CAST(SUM(rev) AS DOUBLE) AS total_rev,
           ROUND(CAST(SUM(CASE WHEN is_target THEN rev
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 4) AS mkt_share
    FROM econ
    GROUP BY l_year
    ORDER BY l_year
    """,
    doc="TPC-H Q8 silhouette — one nation's market share of the "
    "ECONOMY-part trade by year: conditional DECIMAL revenue sums "
    "(exact), share as their double ratio ROUND 4dp (the r21 rule: "
    "decimal→double conversion can differ by 1 ulp between engines, "
    "so ratios are rounded; margin pinned in tests). Part/supplier/"
    "nation broadcast; one shuffle for the year group.",
)
def r31_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supplier, nation = (
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "part", "supplier", "nation")
    )
    joined = (
        li.join(
            F.broadcast(part.where(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    rev = _revenue_col()
    zero = F.lit(0).cast("decimal(18,2)")
    target = F.sum(F.when(F.col("n_name") == "NATION_0", rev).otherwise(zero))
    total = F.sum(rev)
    return (
        joined.groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            target.cast("double").alias("target_rev"),
            total.cast("double").alias("total_rev"),
            F.round(target.cast("double") / total.cast("double"), 4).alias(
                "mkt_share"
            ),
        )
        .orderBy("l_year")
    )


@register(
    "r32_disjunctive_pred",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 20 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 25 AND 50
           AND l_quantity >= 35)
    """,
    doc="TPC-H Q19 silhouette — disjunctive multi-branch predicate "
    "over a fact⋈dim join, the classic pushdown stress: the part "
    "side of each branch (brand, size) filters the BROADCAST build "
    "side and the quantity bounds stay on the probe scan; Catalyst "
    "distributes the OR across the join without expanding it into a "
    "union. Single global DECIMAL aggregate.",
)
def r32_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    ).where(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(20, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(25, 50)
            & (F.col("l_quantity") >= 35)
        )
    )
    return joined.agg(
        F.sum(_revenue_col()).cast("double").alias("revenue"),
        bcount("n_lines"),
    )
