"""Per-query warm A/B bench artifact (r5 VERDICT item 3).

The driver's BENCH_r{N}.json is one cold sweep on a host whose
wall-clock drifts ±25% across rounds (r4 measured +22% on identical
code), so a cross-round per-query "regression" is undecidable from
those artifacts alone. This tool pins the missing evidence: for each
selected query it records

  - multiple WARM runs in ONE session (first run discarded as warmup),
  - a normalized fingerprint of the final (post-AQE) physical plan.

Committed per round as BENCH_AB_r{N}.json, the decision rule between
any two rounds becomes mechanical:

  same plan fingerprint, slower wall   -> host drift, ignore
  different plan fingerprint           -> plan change, read PLANS.md diff

Usage:
    python tools/bench_ab.py --out BENCH_AB_r06.json            # heavy set
    python tools/bench_ab.py q42 q51_simhash --reps 3           # subset
    python tools/bench_ab.py --compare BENCH_AB_r05.json        # verdicts
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import re
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

#: The CPU-heavy similarity/curation/retrieval family whose cross-round
#: elevation keeps needing adjudication (r5 VERDICT "Performance").
HEAVY_SET = [
    "q42",
    "q46_neardup_jaccard",
    "q51_simhash",
    "q53_ann_lsh",
    "q54_cosine_neardup",
    "q74_neardup_components",
    "q75_curation_pipeline",
    "q78_contamination",
    "q83_cogrouped_map",
    "q86_ann_ivf",
    "q87_semantic_dedup",
    "q88_bm25",
    "q89_unigram_ppl",
    "q92_best_of_cluster",
    "r23_pagerank",
    "r27_proration",
    "r48_allpairs_jaccard",
    "r52_bfs_hops",
    "r57_kmeans",
    "r58_embedding_covariance",
    "r59_dbscan",
]

DRIFT_FACTOR = 1.3  # same-plan ratio beyond this reads as host drift


def plan_fingerprint(df) -> str:
    """md5 of the formatted plan with run-varying tokens stripped
    (expression ids, codegen ids, plan ids, scan locations/sizes)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    text = re.sub(r"#\d+[L]?", "#", text)
    text = re.sub(r"\[codegen id : \d+\]", "", text)
    text = re.sub(r"\[plan_id=\d+\]", "", text)
    text = re.sub(r"Location:.*", "Location: <stripped>", text)
    text = re.sub(r"cachedrdd-\d+", "cachedrdd-", text)
    text = re.sub(r"LocalTableScan \(\d+\)", "LocalTableScan", text)
    return hashlib.md5(text.encode()).hexdigest()[:16]


def measure(names: list[str], sf_dir: str, reps: int) -> dict:
    from batch_processing_system_spark.engine.session import get_spark

    spark = get_spark("bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        df.collect()  # warmup run, also finalizes the AQE plan
        fp = plan_fingerprint(df)
        runs = []
        for _ in range(reps):
            t0 = time.time()
            spec.fn(spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "warm_runs": runs,
            "median": round(statistics.median(runs), 3),
            "plan_fp": fp,
        }
        print(f"{name:28s} median={out[name]['median']:>7.3f}s "
              f"runs={runs} plan={fp}", flush=True)
    return out


def compare(cur: dict, prev_path: str) -> None:
    with open(prev_path) as f:
        prev = json.load(f)
    print(f"\nverdicts vs {prev_path}:")
    for name, c in sorted(cur.items()):
        p = prev.get("queries", {}).get(name)
        if p is None:
            print(f"  {name}: new (no baseline)")
            continue
        ratio = c["median"] / p["median"] if p["median"] else float("inf")
        if c["plan_fp"] != p.get("plan_fp"):
            verdict = "PLAN CHANGED — diff PLANS.md"
        elif ratio > DRIFT_FACTOR:
            verdict = f"host drift ({ratio:.2f}x, plan unchanged)"
        elif ratio < 1 / DRIFT_FACTOR:
            verdict = f"faster ({ratio:.2f}x, plan unchanged)"
        else:
            verdict = f"stable ({ratio:.2f}x)"
        print(f"  {name:28s} {p['median']:>7.3f}s -> {c['median']:>7.3f}s  {verdict}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: heavy set)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None, help="write artifact JSON here")
    ap.add_argument("--compare", default=None, help="previous BENCH_AB artifact")
    args = ap.parse_args()

    _ensure_loaded()
    names = args.names or [n for n in HEAVY_SET if n in REGISTRY]
    queries = measure(names, args.sf, args.reps)

    artifact = {
        "sf_dir": args.sf,
        "reps": args.reps,
        "queries": queries,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nwrote {args.out}")
    if args.compare:
        compare(queries, args.compare)


if __name__ == "__main__":
    main()
