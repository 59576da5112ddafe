"""Round-17 optimization profiler: time individual catalog queries the
way bench.py does (build + count, min across repeats) on an arbitrary
SF dir, and optionally dump `explain("formatted")` to plans/r17/.

Usage:
    python tools/profile_r17.py --sf /root/testdata/sf0.1 --repeat 3 q46 q74
    python tools/profile_r17.py --plan before q46        # writes plans/r17/q46_before.txt
    python tools/profile_r17.py --noop q54               # time via noop sink instead of count

The --noop mode (guide §1.4) eagerly computes every column; bench.py's
contract stays count-based, so headline numbers always come from
bench.py — this tool is for isolating where a query's time goes.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plan", default="", help="suffix: write plans/r17/<q>_<suffix>.txt")
    ap.add_argument("--noop", action="store_true", help="time noop write instead of count")
    args = ap.parse_args()

    _ensure_loaded()
    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("profile-r17")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the tables exactly as bench.py does
    from batch_processing_system_spark.engine.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).selectExpr("max(struct(*))").count()
    REGISTRY[args.names[0]].fn(spark, args.sf).count()

    out: dict[str, float] = {}
    for name in args.names:
        spec = REGISTRY[name]
        best = None
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            df = spec.fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        if args.plan:
            plan_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", "r17",
            )
            os.makedirs(plan_dir, exist_ok=True)
            df = spec.fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.plan}.txt"), "w") as f:
                f.write(buf.getvalue())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
