"""Incremental funnel and retention — the streaming twins of q95/q96
(T2/U3 applyInPandasWithState, the batch≡stream story that tumbling /
session windows already have for q39/q40).

Design mirrors the rest of this package: the STATE carries exactly
what the batch semantics need and nothing more —

- funnel: one (stage, t1, t2, t3) tuple per user. Events advance the
  same strict-progression automaton q95 runs as a JVM higher-order
  aggregate; processing is in (es, event_id) order within each batch,
  so with time-ordered arrival (the replay contract; out-of-order
  arrivals within a batch are fine) the final state equals the batch
  answer exactly.
- retention: the per-user set of distinct active DAYS. Each batch
  recomputes (cohort_day = min, offsets = day - min) from the merged
  set and emits the user's full corrected row set, so a late
  earlier-day arrival REVISES the cohort assignment — the stream is
  exactly q96 under ANY arrival order, at the cost of state
  proportional to distinct active days per user (bounded in production
  by the watermark/retention horizon; the matrix only reads offsets
  ≤ 7 but min-day revisions need the full set).

Scale note: state is engine-managed (RocksDB-backed on a real
cluster), keyed by user — O(#users) entries, each O(1) (funnel) or
O(active days) (retention). No shuffle beyond the groupBy(user) the
stateful operator requires.

Epoch-0 sentinel: GroupState tuples round-trip more robustly without
NULLs, so unset funnel timestamps are stored as 0 and surfaced as
NULL in the output (events at epoch 0 are out of scope by contract).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Replayed-event wire schema: es = epoch seconds (bigint), d = days
#: since epoch (int) — both precomputed at export time through the
#: same load_table normalization the batch queries use, so the two
#: engines cannot disagree on timestamp flavor.
EVENT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("d", T.IntegerType()),
    ]
)

_FUNNEL_STATE_SCHEMA = "stage int, t1 bigint, t2 bigint, t3 bigint"
_FUNNEL_OUT_SCHEMA = (
    "user_id bigint, stage int, t1 bigint, t2 bigint, t3 bigint"
)


def _advance_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    stage, t1, t2, t3 = state.get if state.exists else (0, 0, 0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["es", "event_id"])
    for es, etype in zip(batch["es"], batch["event_type"]):
        es = int(es)
        if stage == 0 and etype == "signup":
            stage, t1 = 1, es
        elif stage == 1 and etype == "view" and es > t1:
            stage, t2 = 2, es
        elif stage == 2 and etype == "purchase" and es > t2:
            stage, t3 = 3, es
    state.update((stage, t1, t2, t3))
    yield pd.DataFrame(
        [
            {
                "user_id": int(user_id),
                "stage": stage,
                "t1": t1 or None,
                "t2": t2 or None,
                "t3": t3 or None,
            }
        ]
    )


def funnel_stateful(events_stream: DataFrame) -> DataFrame:
    """q95's automaton with engine-managed per-user state; 'update'
    output emits each touched user's current deepest stage + entry
    times every micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RET_STATE_SCHEMA = "days array<int>"
_RET_OUT_SCHEMA = "user_id bigint, cohort_day int, offset_days bigint"


def _advance_retention(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    days = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        days.update(int(v) for v in pdf["d"])
    ordered = sorted(days)
    state.update((ordered,))
    cohort = ordered[0]
    yield pd.DataFrame(
        {
            "user_id": int(user_id),
            "cohort_day": cohort,
            "offset_days": [d - cohort for d in ordered],
        }
    )


def retention_stateful(events_stream: DataFrame) -> DataFrame:
    """q96's cohort/offset assignment with per-user day-set state;
    each batch emits the user's FULL corrected (cohort, offset) set,
    so downstream stores overwrite-by-user rather than append."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _advance_retention,
        outputStructType=_RET_OUT_SCHEMA,
        stateStructType=_RET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _upsert_store(updates: DataFrame, store_path: str) -> None:
    """Replace each updated user's rows in the parquet store (read,
    anti-join, union, swap — the test-scale stand-in for Delta
    MERGE, same as streaming/state.py's poll store)."""
    spark = updates.sparkSession
    updates = updates.localCheckpoint(eager=True)
    if os.path.exists(store_path):
        kept = spark.read.parquet(store_path).join(
            updates.select("user_id").distinct(), "user_id", "left_anti"
        )
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(store_path + "_next")
    shutil.rmtree(store_path, ignore_errors=True)
    shutil.move(store_path + "_next", store_path)


def run_funnel_stream(
    spark: SparkSession, incoming_dir: str, store_path: str, checkpoint: str
):
    """Wire a replayed-event JSONL stream through the funnel automaton
    into a per-user parquet store. availableNow trigger = catch-up
    replay; the checkpoint carries file offsets AND the automaton
    state across restarts."""
    src = spark.readStream.schema(EVENT_WIRE_SCHEMA).json(incoming_dir)
    out = funnel_stateful(src)
    return (
        out.writeStream.foreachBatch(
            lambda df, _id: _upsert_store(df, store_path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def _append_store(updates: DataFrame, store_path: str, batch_id: int) -> None:
    """Append this batch's updates to a batch-sequenced decision log;
    the current state of a user is their row with the highest
    ``batch_seq`` (``latest_per_key`` resolves it). At 100 TB this is
    the MORE scalable serving shape than the read-antijoin-rewrite
    upsert: each micro-batch does one append write sized by the batch
    (never by the store), and compaction into a latest-wins serving
    table becomes an independent, batched MERGE — the same
    log-then-compact split every large ingest pipeline makes."""
    updates.withColumn("batch_seq", F.lit(batch_id)).write.mode(
        "append"
    ).parquet(store_path)


def latest_per_key(store: DataFrame, key: str = "user_id") -> DataFrame:
    """Resolve an ``_append_store`` log to its latest-wins view: the
    highest-``batch_seq`` row per key (ties impossible — update mode
    emits at most one row per key per batch)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col("batch_seq").desc())
    return (
        store.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_seq")
    )


def run_funnel_stream_parquet(
    spark: SparkSession,
    wire_dir: str,
    store_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    store_mode: str = "upsert",
):
    """The funnel replay over a PARQUET wire log (the catalog-facing
    twin of ``run_funnel_stream``, VERDICT r12 item 6): availableNow +
    ``maxFilesPerTrigger`` splits the replay into one micro-batch per
    wire file, processed oldest-mtime-first (Spark's file source
    ordering), so per-user state genuinely crosses micro-batch
    boundaries when the wire files are time-ordered waves. Parquet
    rather than JSONL because the wire log is written by Spark itself
    (no driver-side collect at any scale) and the schema rides along.

    ``store_mode``: ``"upsert"`` rewrites the store per batch (the
    in-place serving-table shape); ``"append"`` writes a
    batch-sequenced log resolved by ``latest_per_key`` — one
    batch-sized write per micro-batch instead of a store-sized
    rewrite (VERDICT r13 item 3; the two modes are equivalence-tested
    in tests/test_streaming_journeys.py)."""
    src = (
        spark.readStream.schema(EVENT_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wire_dir)
    )
    out = funnel_stateful(src)
    if store_mode == "append":
        sink = lambda df, bid: _append_store(df, store_path, bid)  # noqa: E731
    else:
        sink = lambda df, _id: _upsert_store(df, store_path)  # noqa: E731
    return (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def run_retention_stream(
    spark: SparkSession, incoming_dir: str, store_path: str, checkpoint: str
):
    src = spark.readStream.schema(EVENT_WIRE_SCHEMA).json(incoming_dir)
    out = retention_stateful(src)
    return (
        out.writeStream.foreachBatch(
            lambda df, _id: _upsert_store(df, store_path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def retention_matrix(store: DataFrame) -> DataFrame:
    """The q96 output shape from the retention store: cohort DATE ×
    offset ≤ 7, distinct-user counts."""
    return (
        store.filter(F.col("offset_days") <= 7)
        .groupBy(
            F.date_from_unix_date("cohort_day").alias("cohort_day"),
            "offset_days",
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )
