"""Incremental per-user rolling median — the streaming twin of r44.

The 7-point rolling median needs exactly the trailing 6 values plus
the incoming one, so the per-user state is a bounded ring of the last
6 (eu, event_id, value) purchase observations — O(1) state per user,
emitted rows are FINAL at event time (append-only; a later event can
never revise an earlier row's trailing window under the time-ordered
replay contract the other twins share).

Median arithmetic matches r44's percentile() lerp EXPRESSION, not just
its value: ``lo + (hi - lo) * 0.5`` — ``(lo + hi) / 2`` can differ in
the last ulp, and batch≡stream equality is asserted exact (both sides
then ROUND 4dp).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROLLMED_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("eu", T.LongType()),
    ]
)

_STATE_SCHEMA = "eus array<bigint>, eids array<bigint>, vals array<double>"
_OUT_SCHEMA = "event_id bigint, user_id bigint, med7 double"

_WINDOW = 7


def _round4(x: float) -> float:
    """Spark ROUND is HALF_UP (away from zero); Python round() is
    banker's — match Spark exactly."""
    return math.copysign(math.floor(abs(x) * 10**4 + 0.5), x) / 10**4


def _median_lerp(vals: list[float]) -> float:
    """percentile(v, 0.5) with the p*(n-1) rule — r44's exact lerp."""
    s = sorted(vals)
    n = len(s)
    idx = 0.5 * (n - 1)
    lo_i = int(idx)
    frac = idx - lo_i
    if frac == 0.0:
        return s[lo_i]
    return s[lo_i] + (s[lo_i + 1] - s[lo_i]) * frac


def _advance_rollmed(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    eus, eids, vals = state.get if state.exists else ([], [], [])
    eus, eids, vals = list(eus), list(eids), list(vals)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["eu", "event_id"])
    out: list[dict] = []
    for eu, eid, val in zip(batch["eu"], batch["event_id"], batch["value"]):
        eus.append(int(eu))
        eids.append(int(eid))
        vals.append(float(val))
        if len(vals) > _WINDOW - 1 + 1:
            eus, eids, vals = eus[-_WINDOW:], eids[-_WINDOW:], vals[-_WINDOW:]
        out.append(
            {
                "event_id": int(eid),
                "user_id": int(user_id),
                "med7": _round4(_median_lerp(vals[-_WINDOW:])),
            }
        )
    # keep only the 6 values the NEXT event's window can reach
    state.update((eus[-(_WINDOW - 1) :], eids[-(_WINDOW - 1) :], vals[-(_WINDOW - 1) :]))
    yield pd.DataFrame(out, columns=["event_id", "user_id", "med7"])


def rollmed_stateful(events_stream: DataFrame) -> DataFrame:
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _advance_rollmed,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rollmed_stream(
    spark: SparkSession, incoming_dir: str, out_path: str, checkpoint: str
):
    """Replayed purchase-event JSONL → append-only rolling-median log."""
    src = spark.readStream.schema(ROLLMED_WIRE_SCHEMA).json(incoming_dir)
    out = rollmed_stateful(src)
    return (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
