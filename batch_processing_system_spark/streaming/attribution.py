"""Incremental last-touch attribution — the streaming twin of r06.

Attribution is naturally incremental: a purchase's attribution is
FINAL the moment it happens (only strictly-earlier touches count), so
the stream emits append-only attribution rows, and the per-user state
is a single (touch_id, touch_type, touch_eu) tuple — the most recent
marketing touch seen so far. Same replay contract as the other twins
(time-ordered arrival across batches; within a batch the automaton
sorts), same epoch-µs wire normalization as SCD2's.

Epoch-0 / id-(-1) sentinels: like the funnel twin, the state tuple
round-trips without NULLs; unset touch state is (-1, '', 0) and
surfaces as NULL columns on emitted purchases.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ATTR_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("eu", T.LongType()),
    ]
)

_STATE_SCHEMA = "touch_id bigint, touch_type string, touch_eu bigint"
_OUT_SCHEMA = (
    "purchase_id bigint, user_id bigint, touch_id bigint, "
    "touch_type string, gap_us bigint"
)

_TOUCH_TYPES = ("click", "view")


def _advance_attribution(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    touch_id, touch_type, touch_eu = (
        state.get if state.exists else (-1, "", 0)
    )
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["eu", "event_id"])
    out: list[dict] = []
    for eu, eid, etype in zip(batch["eu"], batch["event_id"], batch["event_type"]):
        eu, eid = int(eu), int(eid)
        if etype == "purchase":
            out.append(
                {
                    "purchase_id": eid,
                    "user_id": int(user_id),
                    "touch_id": touch_id if touch_id >= 0 else None,
                    "touch_type": touch_type or None,
                    "gap_us": (eu - touch_eu) if touch_id >= 0 else None,
                }
            )
        if etype in _TOUCH_TYPES:
            touch_id, touch_type, touch_eu = eid, etype, eu
    state.update((touch_id, touch_type, touch_eu))
    yield pd.DataFrame(
        out,
        columns=["purchase_id", "user_id", "touch_id", "touch_type", "gap_us"],
    )


def attribution_stateful(events_stream: DataFrame) -> DataFrame:
    """r06's frame-excluded window as per-user state: attributions are
    emitted exactly once, at purchase time — append semantics all the
    way to the sink (no upsert store needed)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _advance_attribution,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_attribution_stream(
    spark: SparkSession, incoming_dir: str, out_path: str, checkpoint: str
):
    """Replayed-event JSONL → append-only attribution log."""
    src = spark.readStream.schema(ATTR_WIRE_SCHEMA).json(incoming_dir)
    out = attribution_stateful(src)
    return (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
