"""Per-query bench regression gate (VERDICT round-1 item 7).

Compares a fresh bench run (or a recorded BENCH_r{N}.json) against a
baseline round's JSON, flags any query slower than REGRESSION_FACTOR x
its baseline time (ignoring sub-threshold absolute times, where
scheduling noise dominates), and prints a markdown table for STATUS.md.

Usage:
    python tools/bench_compare.py BENCH_r01.json [current.json]
    # with one arg, runs bench.py fresh for the current side
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REGRESSION_FACTOR = 1.5
MIN_ABS_SEC = 0.5  # below this, jitter swamps the ratio


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver-recorded BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed", d)


def run_fresh() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    # bench.py now ends with a compact summary line (no per-query map);
    # take the last line that carries "queries"
    full = [ln for ln in lines if '"queries"' in ln]
    return json.loads((full or lines)[-1])


def main() -> None:
    base = load(sys.argv[1])
    cur = load(sys.argv[2]) if len(sys.argv) > 2 else run_fresh()

    rows, regressions = [], []
    for name, b in sorted(base["queries"].items()):
        c = cur["queries"].get(name)
        if c is None:
            rows.append((name, b, None, "removed"))
            continue
        ratio = c / b if b else float("inf")
        flag = ""
        if ratio > REGRESSION_FACTOR and c > MIN_ABS_SEC:
            flag = "REGRESSION"
            regressions.append((name, b, c, ratio))
        elif ratio < 1 / REGRESSION_FACTOR and b > MIN_ABS_SEC:
            flag = "improved"
        rows.append((name, b, c, flag))
    for name, c in sorted(cur["queries"].items()):
        if name not in base["queries"]:
            rows.append((name, None, c, "new"))

    print(f"| query | base s | now s | note |")
    print(f"|---|---|---|---|")
    for name, b, c, flag in rows:
        if flag or (b and c and abs(c / b - 1) > 0.25):
            bs = f"{b:.2f}" if b is not None else "—"
            cs = f"{c:.2f}" if c is not None else "—"
            print(f"| {name} | {bs} | {cs} | {flag} |")
    print(
        f"\ntotal: base {base['value']}s -> now {cur['value']}s; "
        f"{len(regressions)} regression(s) beyond {REGRESSION_FACTOR}x"
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
