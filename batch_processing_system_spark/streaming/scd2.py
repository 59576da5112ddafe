"""Incremental SCD2 — the streaming twin of r04 (T2/U3
applyInPandasWithState), completing the batch≡stream story for the
dimension-maintenance shape: type-2 slowly-changing attributes are THE
canonical incremental-vs-rebuild operator (a nightly batch rebuild
recomputes every interval; the stream closes and opens intervals as
changes arrive).

State per user: the single OPEN interval (state, vfrom µs) — O(1), the
minimum the semantics need. Each micro-batch processes the user's
events in (eu, event_id) order; a state change CLOSES the open
interval (emitting its final row) and opens a new one; the open
interval is (re-)emitted every batch the user is touched, with
valid_to_us NULL. The store upserts on (user_id, valid_from_us):
closed intervals are immutable once written, the open row is replaced
in place when it closes — so the store converges to exactly r04's
batch answer under the time-ordered replay contract (same contract as
the funnel twin; out-of-order arrivals WITHIN a batch are fine, the
batch sorts).

Scale: engine-managed state (RocksDB on a cluster), one entry per
user, constant size; the only shuffle is the stateful groupBy(user).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Wire schema: eu = epoch MICROseconds via the same engine.det.epoch_us
#: normalization r04 uses, so batch and stream cannot disagree on
#: timestamp flavor.
SCD2_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("eu", T.LongType()),
    ]
)

_STATE_SCHEMA = "state string, vfrom bigint"
_OUT_SCHEMA = (
    "user_id bigint, state string, valid_from_us bigint, "
    "valid_to_us bigint, is_current boolean"
)


def _advance_scd2(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur_state, vfrom = state.get if state.exists else (None, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["eu", "event_id"])
    out: list[dict] = []
    for eu, etype in zip(batch["eu"], batch["event_type"]):
        eu = int(eu)
        if cur_state is None:
            cur_state, vfrom = etype, eu
        elif etype != cur_state:
            out.append(
                {
                    "user_id": int(user_id),
                    "state": cur_state,
                    "valid_from_us": vfrom,
                    "valid_to_us": eu,
                    "is_current": False,
                }
            )
            cur_state, vfrom = etype, eu
    state.update((cur_state, vfrom))
    out.append(
        {
            "user_id": int(user_id),
            "state": cur_state,
            "valid_from_us": vfrom,
            "valid_to_us": None,
            "is_current": True,
        }
    )
    yield pd.DataFrame(out)


def scd2_stateful(events_stream: DataFrame) -> DataFrame:
    """r04's gaps-and-islands interval build as engine-managed per-user
    state: closed intervals stream out once, the open interval is
    re-emitted (update semantics) until a change closes it."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _advance_scd2,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _upsert_intervals(updates: DataFrame, store_path: str) -> None:
    """Replace by (user_id, valid_from_us): closed intervals land once
    and never change; the open row is overwritten when it closes (the
    test-scale stand-in for Delta MERGE, as in streaming/journeys.py)."""
    spark = updates.sparkSession
    updates = updates.localCheckpoint(eager=True)
    keys = ["user_id", "valid_from_us"]
    if os.path.exists(store_path):
        kept = spark.read.parquet(store_path).join(
            updates.select(*keys).distinct(), keys, "left_anti"
        )
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(store_path + "_next")
    shutil.rmtree(store_path, ignore_errors=True)
    shutil.move(store_path + "_next", store_path)


def run_scd2_stream(
    spark: SparkSession, incoming_dir: str, store_path: str, checkpoint: str
):
    """Replayed-event JSONL → SCD2 interval store. availableNow trigger
    for catch-up replay; the checkpoint carries file offsets and the
    open-interval state across restarts."""
    src = spark.readStream.schema(SCD2_WIRE_SCHEMA).json(incoming_dir)
    out = scd2_stateful(src)
    return (
        out.writeStream.foreachBatch(
            lambda df, _id: _upsert_intervals(df, store_path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )
