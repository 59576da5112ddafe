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

import atexit
import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register
from .temporal import Q95_SQL

#: waves in the wire log = micro-batches in the replay; 3 keeps the
#: cross-batch story real while bounding per-batch stream overhead
_N_WAVES = 3

#: below this total wire size the replay folds all waves into ONE
#: availableNow micro-batch (VERDICT r13 item 3): each extra
#: micro-batch costs ~1.5 s of fixed machinery (measured at sf0.1 —
#: state-store commit + offsets/WAL + per-batch job scheduling), which
#: dominates toy-SF oracle/bench sweeps. Correctness is unchanged
#: either way — the automaton is a fold over the per-user sorted
#:  sequence and each batch sorts within itself (single batch = the
#: global sort) — and the cross-batch contract stays pinned by the
#: forced 3-batch pytest replay. At production SF the wire log blows
#: past this threshold and the replay is genuinely multi-batch.
_SINGLE_BATCH_MAX_WIRE_BYTES = 64 << 20

#: wire logs are written once per (process, sf_dir) — the export is
#: ingest infrastructure, not per-query work (same amortization rule
#: as the bucketed/partitioned layout twins)
_WIRE_CACHE: dict[str, str] = {}

#: previous invocation's store/checkpoint dir, reclaimed on the next
#: call: a long-lived process running the catalog repeatedly (bench
#: passes, oracle sweeps) must not grow /tmp by one run dir per
#: invocation — only the most recent result stays on disk, since the
#: returned DataFrame lazily reads from it. VALIDITY WINDOW (ADVICE
#: r13): a returned streaming-row DataFrame is therefore readable
#: only until the NEXT streaming-row invocation in the same process;
#: all in-repo consumers (bench, check_oracle, the driver gate)
#: collect before re-invoking.
_LAST_RUN_DIR: list[str] = []


def _cleanup_stream_dirs() -> None:
    """Reclaim every wire log and the last run dir of this process
    (VERDICT r13 item 6): wire logs are per-process infrastructure —
    without this, each process of a multi-process catalog sweep left
    one ~events-sized dir behind forever. Registered atexit at import;
    also callable directly (tests pin the O(1)-dirs contract)."""
    while _LAST_RUN_DIR:
        shutil.rmtree(_LAST_RUN_DIR.pop(), ignore_errors=True)
    for d in list(_WIRE_CACHE.values()):
        shutil.rmtree(d, ignore_errors=True)
    _WIRE_CACHE.clear()


atexit.register(_cleanup_stream_dirs)


@contextmanager
def _stream_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily lower spark.sql.shuffle.partitions around a
    streaming .start(): the stateful operator creates one state-store
    instance per shuffle partition PER MICRO-BATCH (checkpoint files
    included), so 32 partitions x 3 waves = 96 store commits of fixed
    overhead at toy SF (VERDICT r13 item 3). The partition count is
    resolved at query start, so the narrow window around start() +
    awaitTermination() is sufficient; catalog execution is sequential,
    so nothing else plans under the lowered value. On a real cluster
    the state partition count is sized to executor count x state
    volume — this helper is the toy-SF analogue of that sizing, not a
    correctness knob (tests pin upsert ≡ append ≡ batch)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


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
    """NOTE (ADVICE r13): the returned DataFrame lazily reads the run
    dir of THIS invocation, which is reclaimed at the start of the
    next streaming-row call — collect before re-invoking."""
    from ..streaming.journeys import latest_per_key, run_funnel_stream_parquet

    wire_dir = _wire_log(spark, sf_dir)
    while _LAST_RUN_DIR:
        shutil.rmtree(_LAST_RUN_DIR.pop(), ignore_errors=True)
    run_dir = tempfile.mkdtemp(prefix="r77_run_")
    _LAST_RUN_DIR.append(run_dir)
    store = os.path.join(run_dir, "store")
    ckpt = os.path.join(run_dir, "ckpt")
    # append-log store + 8 state partitions (VERDICT r13 item 3): one
    # batch-sized append per wave instead of a store rewrite, and a
    # quarter of the per-batch state-store commits; small wire logs
    # additionally fold into a single availableNow batch (see
    # _SINGLE_BATCH_MAX_WIRE_BYTES)
    wire_bytes = sum(
        os.path.getsize(os.path.join(wire_dir, f))
        for f in os.listdir(wire_dir)
        if f.endswith(".parquet")
    )
    mft = _N_WAVES if wire_bytes <= _SINGLE_BATCH_MAX_WIRE_BYTES else 1
    with _stream_shuffle_partitions(spark, 8):
        q = run_funnel_stream_parquet(
            spark, wire_dir, store, ckpt,
            max_files_per_trigger=mft, store_mode="append",
        ).start()
        q.awaitTermination()
    return latest_per_key(spark.read.parquet(store)).select(
        "user_id", "stage", "t1", "t2", "t3"
    )
