"""Temporal operators, batch equivalents (SURVEY §2.3 T4-T6).

The reference's only temporal machinery is a 5-minute poll cycle
(/root/reference/README.md:81,145) — incremental batch. These are the
EXT window operators a general engine needs; their true-streaming
counterparts (event-time windows + watermarks over readStream) live in
``batch_processing_system_spark/streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..engine.det import bcount, dsum
from ..engine.io import load_table
from . import register


@register(
    "q39",
    """
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_bucket,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="T4 tumbling window (batch equiv) — date_trunc bucket + hash agg; "
    "identical semantics to groupBy(window(ts, '1 hour')) in streaming.",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_bucket"), F.col("event_type")
        )
        .agg(bcount("cnt"), dsum("value", "sum_value"))
    )


@register(
    "q40",
    """
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
               LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_es
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM e GROUP BY user_id
    """,
    doc="T6 session window (batch equiv) — gaps-and-islands: lag + "
    "cumulative new-session flags, 30-min gap rule (SURVEY §7 H4: the "
    "same logic written once for both engines). Streaming counterpart: "
    "session_window(ts, '30 minutes').",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp("ts")
    flagged = events.select(
        "user_id",
        F.when(
            F.lag(es).over(w).isNull() | ((es - F.lag(es).over(w)) > 1800), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").cast("bigint").alias("n_sessions")
    )
