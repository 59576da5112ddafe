"""Set operators (SURVEY §2.2 O1-O5): union, intersect/except, dedup.

Reference grounding: output-file results ∪ error-file results form one
outcome stream (/root/reference/README.md:89-90,93-103); submitted-ids
minus answered-ids reconciliation is REF-implied (:67,105-107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.det import bcount
from ..engine.io import load_table
from . import register


@register(
    "q29",
    """
    SELECT id, COUNT(*) AS cnt FROM (
        SELECT o_custkey AS id FROM orders
        UNION ALL
        SELECT c_custkey AS id FROM customer
    ) GROUP BY id
    """,
    doc="O1 union — UNION ALL (no shuffle, pure concatenation of "
    "partition lists) + group count; covers both all- and "
    "distinct-semantics in one deterministic result.",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    unioned = orders.select(F.col("o_custkey").alias("id")).unionByName(
        customer.select(F.col("c_custkey").alias("id"))
    )
    return unioned.groupBy("id").agg(bcount("cnt"))


@register(
    "q30",
    """
    SELECT 'both' AS tag, id FROM (
        SELECT c_custkey AS id FROM customer
        INTERSECT
        SELECT o_custkey AS id FROM orders
    )
    UNION ALL
    SELECT 'only_customer' AS tag, id FROM (
        SELECT c_custkey AS id FROM customer
        EXCEPT
        SELECT o_custkey AS id FROM orders
    )
    """,
    doc="O2 intersect/except — id-set reconciliation "
    "(/root/reference/README.md:67,105-107); both plan as aggregated "
    "semi/anti joins under Catalyst.",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    cust_ids = customer.select(F.col("c_custkey").alias("id"))
    order_ids = orders.select(F.col("o_custkey").alias("id"))
    both = cust_ids.intersect(order_ids).select(F.lit("both").alias("tag"), "id")
    only_c = cust_ids.exceptAll(order_ids).distinct().select(
        F.lit("only_customer").alias("tag"), "id"
    )
    return both.unionByName(only_c)


@register(
    "q33",
    "SELECT DISTINCT lang, source FROM documents",
    doc="O5/X1 exact dedup — dropDuplicates = hash-partition on the full "
    "key then first-per-group; the baseline of the north-star dedup "
    "family (map-side partial dedup keeps the shuffle small).",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang", "source").dropDuplicates()
