"""Benchmark harness (SURVEY §7 M5): runs the query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints the headline JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

followed by a compact summary line (same value, no per-query map) so a
tail-windowed capture still ends in parseable JSON; the full per-query
payload is also persisted to .benchmarks/bench_sf{sf}.json.

``value`` is the total wall-clock across all catalog queries (each
executed to completion via a count-collect, so every shuffle/agg/join in
the plan actually runs; results are not materialized to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    _ensure_loaded()

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path and touch every table's footer once so
    # per-query numbers measure the engine, not first-touch classloading
    # or filesystem cache misses.
    from batch_processing_system_spark.engine.io import TABLES, load_table

    for t in TABLES:
        # full-width read (count() alone prunes every column and would
        # leave first-column-touch decode costs inside query timings)
        df = load_table(spark, sf_dir, t)
        df.selectExpr("max(struct(*))").count()
    next(iter(REGISTRY.values())).fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            df.count()
            per_query[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record, don't abort the whole bench
            per_query[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(v for v in per_query.values() if v >= 0), 3)
    conf = spark.conf
    payload = {
        "metric": "catalog_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "config": {
            "spark_version": spark.version,
            "master": spark.sparkContext.master,
            "shuffle_partitions": conf.get("spark.sql.shuffle.partitions"),
            "aqe": conf.get("spark.sql.adaptive.enabled"),
            "cbo": conf.get("spark.sql.cbo.enabled"),
            "broadcast_threshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
        },
    }
    print(json.dumps(payload))
    # The driver records only a TAIL window of stdout, which truncates
    # the giant per-query line (BENCH_r*.json kept showing
    # "parsed": null — VERDICT r9 item 3). Two mitigations:
    # 1. persist the full per-query artifact in the repo itself;
    # 2. END stdout with a compact one-liner that always fits the
    #    window, so the recorded tail is parseable JSON.
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks")
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, f"bench_sf{sf}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "catalog_wall_clock",
                "value": total,
                "unit": "sec",
                "n": len(per_query),
                "failed": sum(1 for v in per_query.values() if v < 0),
                "sf": payload["sf"],
                "per_query": f".benchmarks/bench_sf{sf}.json",
            }
        )
    )


if __name__ == "__main__":
    main()
