"""Scalar function families (SURVEY §2.3 C2-C5, C8): strings, date/time,
math, arrays. All JVM-side built-ins — whole-stage codegen, no Python.

Reference grounding: method/url/status string handling
(/root/reference/README.md:59-60,120-125), created_at/updated_at
stamping (:126-127,135), exponential backoff 2^n (:84,146),
choices[0] array indexing (:98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register


@register(
    "q34",
    r"""
    SELECT c_custkey,
           UPPER(c_name) AS up_name,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           SUBSTRING(c_mktsegment, 1, 3) AS seg3,
           c_name || '/' || c_mktsegment AS tagged,
           REPLACE(c_name, 'Customer', 'Cust') AS short_name,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
    doc="C2 string family — upper/length/substring/concat/replace/regexp.",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@register(
    "q36",
    """
    SELECT event_id,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
    FROM events
    """,
    doc="C3 date/time family — created_at/updated_at-style stamping "
    "(/root/reference/README.md:126-127). Hashed outputs are DATE and "
    "BIGINT, never raw ns timestamps (SURVEY §2.5 D6).",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.hour("ts").cast("bigint").alias("h"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@register(
    "q37",
    """
    SELECT o_orderkey,
           ROUND(SQRT(o_totalprice), 4) AS sqrt_price,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
           CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_price,
           ABS(o_totalprice - 100000.0) AS dist_100k,
           POW(2, o_orderkey % 10) AS backoff
    FROM orders
    """,
    doc="C4 math family — sqrt/floor/ceil/abs/pow; 2^n is the spec's "
    "retry backoff (/root/reference/README.md:84,146). Float-producing "
    "fns rounded per §2.5 D7 where libm could differ (sqrt); exact "
    "IEEE ops (abs/sub, small powers of 2) hash as-is.",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.floor("o_totalprice").cast("bigint").alias("floor_price"),
        F.ceil("o_totalprice").cast("bigint").alias("ceil_price"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
        F.pow(F.lit(2), F.col("o_orderkey") % 10).alias("backoff"),
    )


@register(
    "q38",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1
    FROM embeddings
    """,
    doc="C5 array family — size + element_at (1-based in both engines); "
    "the spec's choices[0] indexing (/root/reference/README.md:98).",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
    )
