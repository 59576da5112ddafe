"""Merge bench artifacts by per-query minimum (round-13 crossover kit).

This host swings 2-6x between passes (SCALE.md noise-band notes), so a
single min-of-2 artifact can still be one noisy window — the round-12
q42 sf10 reading moved 744 s -> 423 s on a second independent run. The
defensible estimator for a deterministic workload under asymmetric
noise is the MINIMUM across ALL observed passes: every perturbation
only adds time. This tool folds N bench.py artifacts (same catalog,
same SF, same routing config) into one merged artifact whose per-query
times are the min across every contributing artifact, with provenance
(each input's pass totals) kept in the config block so a reader can see
the band the minima were drawn from.

Legs being compared must be merged from the SAME number of passes —
min-of-4 vs min-of-2 systematically favors the deeper leg.

Usage:
    python tools/bench_merge.py OUT.json IN1.json IN2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    arts = []
    for p in in_paths:
        with open(p) as f:
            d = json.load(f)
        arts.append(d.get("parsed", d))

    base = arts[0]
    names = set(base["queries"])
    for a in arts[1:]:
        if set(a["queries"]) != names:
            sys.exit("bench_merge: artifacts cover different query sets")
        for key in ("bucketed_routing", "partitioned_routing", "hybrid_routing"):
            if a["config"].get(key) != base["config"].get(key):
                sys.exit(
                    f"bench_merge: routing mismatch on {key} — merging a "
                    "plain and a routed leg would fabricate a run that "
                    "never happened"
                )
        if a.get("sf") != base.get("sf"):
            sys.exit("bench_merge: SF mismatch across artifacts")

    queries = {
        n: min(a["queries"][n] for a in arts if a["queries"][n] >= 0)
        if any(a["queries"][n] >= 0 for a in arts)
        else -1.0
        for n in names
    }
    merged = {
        "metric": base["metric"],
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "unit": base["unit"],
        "queries": queries,
        "sf": base["sf"],
        "config": {
            **base["config"],
            "merged_from": [
                {"path": p, "pass_totals": a["config"]["pass_totals"]}
                for p, a in zip(in_paths, arts)
            ],
            "repeat": sum(a["config"]["repeat"] for a in arts),
            "pass_totals": [
                t for a in arts for t in a["config"]["pass_totals"]
            ],
        },
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(
        json.dumps(
            {
                "merged": out_path,
                "value": merged["value"],
                "passes": merged["config"]["pass_totals"],
            }
        )
    )


if __name__ == "__main__":
    main()
