"""Streaming-lane catalog rows (VERDICT r12 item 6).

The streaming twins (scd2, journeys, curation, neardup, heavyhitters)
were pytest-verified but invisible to the catalog/bench surface; this
module puts one genuinely-streaming execution INTO the driver's
correctness gate: the q95 funnel automaton replayed through Structured
Streaming (readStream → applyInPandasWithState → foreachBatch upsert
store) over the same events table, pinned to the SAME DuckDB oracle as
the batch q95 — so batch ≡ stream is hash-checked by the gate itself,
not just by the test suite.

Replay design (all Spark-side, no driver collect at any size):

1. *Wire export* — events projected to the journeys wire schema
   (user_id, event_id, event_type, es, d) and written as parquet split
   into ``_N_WAVES`` contiguous (es, event_id) ranges via
   ``repartitionByRange``; file mtimes are then stamped in ascending
   range order. Exported once per (sf_dir, process): the wire log is
   ingest infrastructure, like the layout twins.
2. *Replay* — availableNow + maxFilesPerTrigger=1 processes one wave
   per micro-batch, oldest mtime first (Spark's file-source order), so
   a user active across waves has state carried across batches by the
   engine — the cross-batch contract the pytest waves also exercise.
   ANY (es, event_id)-range split yields the batch answer exactly: the
   automaton is a fold over the per-user (es, event_id)-sorted
   sequence, each batch sorts within itself, and range concatenation
   IS the global order (streaming/journeys.py docstring).
3. *Store* — per-user upsert (read, anti-join, union, swap) per batch;
   the final store is the q95 output shape.

Provenance: the reference's batch/stream duality requirement
(/root/reference/README.md:86-110 state machine + :83 polling loop);
operator rows T1/T2/X-journeys in SURVEY §2.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register
from .temporal import Q95_SQL

#: waves in the wire log = micro-batches in the replay; 3 keeps the
#: cross-batch story real while bounding per-batch stream overhead
_N_WAVES = 3

#: wire logs are written once per (process, sf_dir) — the export is
#: ingest infrastructure, not per-query work (same amortization rule
#: as the bucketed/partitioned layout twins)
_WIRE_CACHE: dict[str, str] = {}

#: previous invocation's store/checkpoint dir, reclaimed on the next
#: call: a long-lived process running the catalog repeatedly (bench
#: passes, oracle sweeps) must not grow /tmp by one run dir per
#: invocation — only the most recent result stays on disk, since the
#: returned DataFrame lazily reads from it
_LAST_RUN_DIR: list[str] = []


def _wire_log(spark: SparkSession, sf_dir: str) -> str:
    key = os.path.abspath(sf_dir)
    if key in _WIRE_CACHE:
        return _WIRE_CACHE[key]
    wire_dir = tempfile.mkdtemp(prefix="r77_wire_")
    evs = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.unix_date(F.to_date(F.date_trunc("day", F.col("ts"))))
        .cast("int")
        .alias("d"),
    )
    # contiguous (es, event_id) ranges: partition i of the range
    # partitioner holds the i-th lowest key range and is written by
    # task i as part-0000i-*, so ascending file NAME = ascending time
    # range. Unique sort keys (event_id tie-break) make the split
    # exact; empty ranges (tiny inputs) are just empty waves.
    evs.repartitionByRange(
        _N_WAVES, F.col("es"), F.col("event_id")
    ).write.mode("overwrite").parquet(wire_dir)
    files = sorted(
        f for f in os.listdir(wire_dir) if f.endswith(".parquet")
    )
    # stamp strictly ascending mtimes: the streaming file source picks
    # oldest-modified first, which makes wave order deterministic
    for i, f in enumerate(files):
        os.utime(os.path.join(wire_dir, f), (1_000_000_000 + 10 * i,) * 2)
    _WIRE_CACHE[key] = wire_dir
    return wire_dir


@register(
    "r77_streaming_funnel",
    Q95_SQL,
    doc="The q95 funnel executed as a STREAM — the catalog-visible leg "
    "of the journeys twin (VERDICT r12 item 6): the events table is "
    "replayed as a 3-wave time-ordered parquet wire log through "
    "readStream → applyInPandasWithState (one micro-batch per wave, "
    "availableNow) into a per-user upsert store, and the FINAL store "
    "must hash-match the exact same DuckDB oracle as the batch q95 — "
    "batch ≡ stream checked by the driver gate itself. Cross-batch "
    "state is real: users active in several waves have their "
    "(stage, t1, t2, t3) carried across micro-batches by the engine's "
    "state store. Equality argument: the automaton is a fold over the "
    "per-user (es, event_id)-sorted sequence; each batch sorts within "
    "itself and the waves are contiguous (es, event_id) ranges "
    "processed in range order, so the concatenation the state machine "
    "sees IS the globally sorted sequence. At 100 TB: the wire export "
    "is the ingest log itself (written once), state is RocksDB-backed "
    "O(#users x O(1)), and the store upsert becomes a MERGE into the "
    "serving table — the exact §3 polling-pipeline shape. Tier-1.",
)
def r77_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.journeys import run_funnel_stream_parquet

    import shutil

    wire_dir = _wire_log(spark, sf_dir)
    while _LAST_RUN_DIR:
        shutil.rmtree(_LAST_RUN_DIR.pop(), ignore_errors=True)
    run_dir = tempfile.mkdtemp(prefix="r77_run_")
    _LAST_RUN_DIR.append(run_dir)
    store = os.path.join(run_dir, "store")
    ckpt = os.path.join(run_dir, "ckpt")
    q = run_funnel_stream_parquet(spark, wire_dir, store, ckpt).start()
    q.awaitTermination()
    return spark.read.parquet(store).select(
        "user_id", "stage", "t1", "t2", "t3"
    )
