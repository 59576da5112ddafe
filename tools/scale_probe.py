"""Measured scaling probe (SCALE.md "Measured scaling" table).

Replicates sf0.1 tables tenfold with structure-preserving offsets —
lineitem/orders get offset keys, events get time-shifted replicas
(extending the time axis, as real growth does), documents get
word-prefixed replicas (disjoint shingle spaces, so near-dup
structure replicates instead of colliding) — writes the result to a
scratch dir, and times warmed queries at both scales.

Usage: python tools/scale_probe.py [q18 q32 q46_neardup_jaccard ...]
Prints one JSON line per query: name, sf0.1 seconds, 10x seconds,
growth factor.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/scale10"
REPLICAS = 10
DEFAULT_QUERIES = ["q18", "q13", "q31", "q32", "q46_neardup_jaccard"]

KEY_OFFSETS = {  # table -> (key columns to offset, offset stride)
    "lineitem": (["l_orderkey"], 10_000_000),
    "orders": (["o_orderkey", "o_custkey"], 10_000_000),
    "customer": (["c_custkey"], 10_000_000),
}


def build_10x(spark) -> None:
    if os.path.exists(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    os.makedirs(OUT_DIR)
    for t in ("region", "nation", "part", "supplier"):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(OUT_DIR, f"{t}.parquet"))

    # embeddings: replica i rolls each vector by i dimensions — within
    # a replica the similarity structure is identical to sf0.1, across
    # replicas rolled vectors decorrelate (the embedding analogue of
    # the word-prefix trick for documents), so ANN/semantic-dedup work
    # grows linearly in replicas instead of quadratically colliding
    emb = load_table(spark, SF_DIR, "embeddings")
    reps = []
    for i in range(REPLICAS):
        r = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i:
            r = r.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {i + 1}, size(embedding) - {i}), "
                    f"slice(embedding, 1, {i}))"
                ),
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(os.path.join(OUT_DIR, "embeddings.parquet"))

    for t, (keys, stride) in KEY_OFFSETS.items():
        df = load_table(spark, SF_DIR, t)
        reps = []
        for i in range(REPLICAS):
            r = df
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * stride))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        out.write.mode("overwrite").parquet(os.path.join(OUT_DIR, f"{t}.parquet"))

    ev = load_table(spark, SF_DIR, "events")
    reps = []
    for i in range(REPLICAS):
        reps.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 90} DAYS"))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(os.path.join(OUT_DIR, "events.parquet"))

    docs = load_table(spark, SF_DIR, "documents")
    reps = []
    for i in range(REPLICAS):
        reps.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            .withColumn(
                "text",
                F.regexp_replace("text", r"(\w+)", f"r{i}$1")
                if i
                else F.col("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(os.path.join(OUT_DIR, "documents.parquet"))


def time_query(spark, name, sf_dir) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).collect()  # warm
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return round(time.time() - t0, 2)


def main() -> None:
    _ensure_loaded()
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(
        "scale-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)
    for name in names:
        base = time_query(spark, name, SF_DIR)
        big = time_query(spark, name, OUT_DIR)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf0.1_s": base,
                    "x10_s": big,
                    "growth": round(big / base, 2) if base else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
