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
