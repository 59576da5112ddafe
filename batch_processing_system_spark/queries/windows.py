"""Window functions and ordered analytics (SURVEY §2.2 W1-W5, O3-O4).

Reference grounding: JSONL line numbering for error positions
(/root/reference/README.md:46), "model determined from the first line"
(:61) — implemented as row_number, never first() (§2.5 D4) — and
latest-status-per-job semantics (:85,127).

Scale note: windows partitioned by a key (user_id, segment) shuffle
once on that key and scale linearly. The two global windows here (q24
after a LIMIT 100, q32 over a time axis) are the patterns that do NOT
scale unpartitioned — q24 bounds its input first, and q32's docstring
describes the day-bucketed variant used on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..engine.io import load_table
from . import register


@register(
    "q24",
    """
    SELECT event_id, CAST(ROW_NUMBER() OVER (ORDER BY event_id) AS BIGINT) AS rn
    FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 100)
    """,
    doc="W1 row_number — the spec's per-line error positions "
    "(/root/reference/README.md:46). Input bounded to 100 rows BEFORE the "
    "single-partition window, so the global sort is a TakeOrderedAndProject.",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first100 = events.select("event_id").orderBy("event_id").limit(100)
    w = Window.orderBy("event_id")
    return first100.select(
        "event_id", F.row_number().over(w).cast("bigint").alias("rn")
    )


@register(
    "q25",
    """
    SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="W2 latest-per-key — current job status = latest updated_at per "
    "job (/root/reference/README.md:85,127); event_id desc tiebreak (D3).",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )


@register(
    "q26",
    """
    SELECT c_mktsegment, c_custkey, CAST(rn AS BIGINT) AS rn FROM (
        SELECT c_mktsegment, c_custkey,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC,
                                           c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
    doc="W3/O4 top-k per group — rank-and-filter, Spark's only per-group "
    "limit; DECIMAL sort key + custkey tiebreak per §2.5 D1/D3.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").cast("decimal(18,2)").desc(), F.col("c_custkey")
    )
    return (
        customer.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "rn")
    )


@register(
    "q27",
    """
    SELECT event_id,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    doc="W4 lag/lead — previous and next event per user (gap detection, "
    "sessionization input).",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "q28",
    """
    SELECT event_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
    FROM events
    """,
    doc="W5 aggregate-over-frame — running count per user.",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select("event_id", F.count(F.lit(1)).over(w).alias("running_cnt"))


@register(
    "q31",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
    LIMIT 10
    """,
    doc="O3 global sort + limit — Spark plans TakeOrderedAndProject "
    "(per-partition top-10 then driver merge of 10-row heaps; no global "
    "shuffle, safe at any scale).",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price_d = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.orderBy(price_d.desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", price_d.cast("double").alias("total_price"))
    )


@register(
    "q32",
    """
    SELECT event_id,
           COUNT(*) OVER (ORDER BY epoch_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS cnt_1h
    FROM (
        SELECT event_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
        FROM events
    )
    """,
    doc="W5/T5 sliding window (batch form) — events in the preceding "
    "hour per row via numeric RANGE frame. Day-bucketed so it scales: "
    "instead of one global time-ordered window (single-partition sort "
    "of the whole table), every row is assigned to its UTC day, the "
    "last hour of each day is replicated into the NEXT day's bucket "
    "(frame lookback is 3600s, so a row never needs data older than "
    "that), and the RANGE window runs partitioned by day — one shuffle "
    "on the day key, each partition sorts only its own day. Rows "
    "carried in as overlap are flagged and dropped after the window, "
    "so the per-row counts are identical to the global form "
    "(hash-equality asserted in tests and by the oracle).",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ts = events.select("event_id", F.unix_timestamp("ts").alias("epoch_s"))
    day = (F.col("epoch_s") / F.lit(86400)).cast("bigint")
    own = ts.select("event_id", "epoch_s", day.alias("day"), F.lit(False).alias("carried"))
    # replicate each day's final hour into the next day's bucket; those
    # rows only FEED the frame there, they are not re-emitted.
    overlap = ts.filter(F.col("epoch_s") % 86400 >= 86400 - 3600).select(
        "event_id", "epoch_s", (day + 1).alias("day"), F.lit(True).alias("carried")
    )
    w = Window.partitionBy("day").orderBy("epoch_s").rangeBetween(-3600, 0)
    return (
        own.unionAll(overlap)
        .select("event_id", "carried", F.count(F.lit(1)).over(w).alias("cnt_1h"))
        .filter(~F.col("carried"))
        .select("event_id", "cnt_1h")
    )
