"""q42 banding-headroom probe (VERDICT r13 item 7).

SCALE.md §Round-12 measured q42's MinHashLSH candidate enumeration AT
its quadratic bound (sf3→sf10 exponent 1.90 vs the ≤2 contract) and
named the mechanism: the synthetic corpus's fixed 31-word vocabulary
bounds the shingle domain, so single-hash band buckets grow linearly
with corpus size and bucket-mate enumeration grows quadratically.
This probe measures the standard mitigation — COMPOUND BANDS (r
minhash rows per band, bucket key = the r-tuple) — against the stock
r=1 path on the same corpus, requiring IDENTICAL verified output:

  r=1, b=16  (stock q42): per-pair candidate prob per band = J;
             miss-all probability (1-J)^16 = 4.3e-7 at J=0.6.
  r=2, b=32: candidate prob J² per band (background pairs at J≈0.2
             collide 5x less per band); miss (1-J²)^32 = 6.3e-7.
  r=3, b=64: candidate prob J³; miss (1-J³)^64 = 1.7e-7.

All three verify candidates with the same _verify_jaccard_pairs, so
output equality is checked directly; what changes is candidate count
and wall time. Usage:

    python tools/q42_compound_probe.py [--sf /root/repo/.localdata/sf3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries.similarity import (
    SEED,
    _shingles,
    _verify_jaccard_pairs,
    minhash_band_candidates,
)


def compound_candidates(sh, n_bands: int, band_rows: int):
    """Shared with the production knob since round 16: the generator
    moved into queries/similarity.py (minhash_band_candidates) so
    SPARK_GRAFT_Q42_BANDS exercises the EXACT code this probe measured
    output-identical at sf3/sf10; this wrapper keeps the probe CLI."""
    return minhash_band_candidates(sh, n_bands, band_rows)


def stock_candidates(spark, docs, sh):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    feats = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    vecs = tf.transform(feats)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=SEED
    )
    pairs = lsh.fit(vecs).approxSimilarityJoin(vecs, vecs, 0.45, distCol="d")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("da"),
            F.col("datasetB.doc_id").alias("db"),
        )
        .distinct()
    )


_ALL_LEGS = ("stock_r1_b16", "compound_r2_b32", "compound_r3_b64")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.localdata/sf3")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--legs",
        default=",".join(_ALL_LEGS),
        help="comma-separated subset of legs to run in THIS process — "
        "at sf10 the stock leg's quadratic candidate enumeration can "
        "stall the JVM into heartbeat-reaping territory, so run each "
        "leg in its own process and compare via --pairs-dir (r15)",
    )
    ap.add_argument(
        "--pairs-dir",
        default=None,
        help="persist each leg's verified pair set to "
        "PAIRS_DIR/<leg>.json and, when every leg's dump is present, "
        "emit the cross-leg output-equality verdict",
    )
    args = ap.parse_args()
    # stall-tolerant timeouts for the quadratic stock leg at sf≥10:
    # a full-heap GC pause beyond 120 s would otherwise get the local
    # executor heartbeat-reaped mid-probe (observed at sf10, r15)
    spark = get_spark(
        "q42-compound-probe",
        extra_conf={
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "120s",
        },
    )
    docs = load_table(spark, args.sf, "documents")
    sh = _shingles(docs, n=5).localCheckpoint(eager=True)

    builders = {
        "stock_r1_b16": lambda: stock_candidates(spark, docs, sh),
        "compound_r2_b32": lambda: compound_candidates(sh, 32, 2),
        "compound_r3_b64": lambda: compound_candidates(sh, 64, 3),
    }
    wanted = [n.strip() for n in args.legs.split(",") if n.strip()]
    unknown = set(wanted) - set(builders)
    if unknown:
        sys.exit(f"unknown legs: {sorted(unknown)}")
    results = {}
    verified_sets = {}
    for name in wanted:
        build = builders[name]
        best = None
        for _ in range(max(1, args.repeat)):
            t0 = time.time()
            cand = build()
            n_cand = cand.count()
            t_cand = time.time() - t0
            t0 = time.time()
            ver = _verify_jaccard_pairs(cand, sh)
            # bounded-collect: verified near-dup pairs are output-sized
            pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in ver.collect()}
            t_ver = time.time() - t0
            tot = t_cand + t_ver
            if best is None or tot < best["total_s"]:
                best = {
                    "candidates": n_cand,
                    "verified": len(pairs),
                    "cand_s": round(t_cand, 2),
                    "verify_s": round(t_ver, 2),
                    "total_s": round(tot, 2),
                }
            verified_sets[name] = pairs
        results[name] = best

    if args.pairs_dir:
        import os

        os.makedirs(args.pairs_dir, exist_ok=True)
        for name, pairs in verified_sets.items():
            with open(os.path.join(args.pairs_dir, f"{name}.json"), "w") as f:
                json.dump(sorted(list(p) for p in pairs), f)
        dumps = {}
        for name in _ALL_LEGS:
            p = os.path.join(args.pairs_dir, f"{name}.json")
            if os.path.exists(p):
                with open(p) as f:
                    dumps[name] = {tuple(x) for x in json.load(f)}
        if "stock_r1_b16" in dumps:
            for name, pairs in dumps.items():
                if name in results:
                    results[name]["output_equal_to_stock"] = (
                        pairs == dumps["stock_r1_b16"]
                    )
                else:
                    results[name] = {
                        "from_dump": True,
                        "verified": len(pairs),
                        "output_equal_to_stock": pairs
                        == dumps["stock_r1_b16"],
                    }
    elif "stock_r1_b16" in verified_sets:
        base = verified_sets["stock_r1_b16"]
        for name, pairs in verified_sets.items():
            results[name]["output_equal_to_stock"] = pairs == base
    print(json.dumps({"sf_dir": args.sf, "legs": results}, indent=2))


if __name__ == "__main__":
    main()
