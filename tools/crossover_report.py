"""Noise-controlled plain-vs-routed bench comparison (round 13).

Compares a plain-leg bench artifact against a routed-leg artifact and
separates the ROUTING effect from host drift using the catalog's
built-in control group: queries whose source touches no table that the
routed leg re-routes (embeddings-only queries — embeddings routes
`plain` under every flag combination, engine/io.py). If the control
group also "improved", the two legs were measured in different host
windows and the raw ratio overstates the effect; the corrected
estimate divides the routed-group ratio by the control-group ratio.

This is the tool behind SCALE.md §Round-13's tables:

    python tools/crossover_report.py \
        .benchmarks/bench_sf1.json .benchmarks/bench_sf1_routed_hybrid.json

Table attribution is static: each registered query function's source is
scanned for table-name literals (the house style loads tables only via
``load_table(spark, sf_dir, "<name>")``). Queries with no table literal
in their own source (helpers load for them) are reported as a third
"unknown" bucket rather than guessed.
"""

from __future__ import annotations

import ast
import inspect
import json
import statistics
import sys
import textwrap

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from batch_processing_system_spark.engine.io import BUCKET_SPECS
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

#: tables a routed leg serves from a layout twin, DERIVED from the
#: routing source of truth (ADVICE r13: a hand-copied set silently
#: drifts when a new table is bucketed, contaminating the control
#: group and biasing the corrected ratio toward 1.0). events is
#: additionally served by the hybrid/partitioned twins even when it
#: is not in BUCKET_SPECS.
ROUTED_TABLES = set(BUCKET_SPECS) | {"events"}

_TABLE_NAMES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}


def _tables_of(fn) -> set[str]:
    """Tables a query function loads, from load_table/load_tables CALL
    SITES only (ADVICE r13: inspect.getsource includes the @register
    decorator's oracle SQL and doc strings, so a regex over the whole
    source would let a quoted table name in prose flip a control query
    into the routed group). AST-based so both house idioms resolve:
    string-literal arguments and the ``load_table(spark, sf_dir, t)
    for t in ("a", "b")`` comprehension."""
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return set()
    names: set[str] = set()
    var_args: set[str] = set()
    for node in ast.walk(tree):
        callee = None
        if isinstance(node, ast.Call):
            if isinstance(node.func, ast.Name):
                callee = node.func.id
            elif isinstance(node.func, ast.Attribute):
                # ADVICE r14: attribute-qualified call sites
                # (io.load_table(...)) must classify too, or a routed
                # query silently lands in the control group
                callee = node.func.attr
        if callee in ("load_table", "load_tables"):
            for a in node.args:
                if isinstance(a, ast.Constant) and isinstance(a.value, str):
                    if a.value in _TABLE_NAMES:
                        names.add(a.value)
                elif isinstance(a, ast.Name):
                    var_args.add(a.id)
    if var_args:
        for node in ast.walk(tree):
            iters = []
            if isinstance(node, (ast.GeneratorExp, ast.ListComp)):
                iters = [
                    g.iter
                    for g in node.generators
                    if isinstance(g.target, ast.Name)
                    and g.target.id in var_args
                ]
            elif isinstance(node, ast.For):
                if (
                    isinstance(node.target, ast.Name)
                    and node.target.id in var_args
                ):
                    iters = [node.iter]
            for it in iters:
                if isinstance(it, (ast.Tuple, ast.List)):
                    for e in it.elts:
                        if (
                            isinstance(e, ast.Constant)
                            and isinstance(e.value, str)
                            and e.value in _TABLE_NAMES
                        ):
                            names.add(e.value)
    return names


def _group(name: str) -> str:
    tabs = _tables_of(REGISTRY[name].fn)
    if not tabs:
        return "unknown"
    return "routed" if tabs & ROUTED_TABLES else "control"


def _stats(names, qp, qr):
    names = [n for n in names if qp.get(n, 0) > 0 and qr.get(n, 0) > 0]
    if not names:
        return None
    ratios = [qr[n] / qp[n] for n in names]
    return {
        "n": len(names),
        "median": round(statistics.median(ratios), 3),
        "total": round(sum(qr[n] for n in names) / sum(qp[n] for n in names), 3),
    }


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    with open(sys.argv[1]) as f:
        plain = json.load(f)
    with open(sys.argv[2]) as f:
        routed = json.load(f)
    p_flags = [
        plain["config"].get(k)
        for k in ("bucketed_routing", "partitioned_routing", "hybrid_routing")
    ]
    r_flags = [
        routed["config"].get(k)
        for k in ("bucketed_routing", "partitioned_routing", "hybrid_routing")
    ]
    if any(p_flags) or not any(r_flags):
        sys.exit(
            "crossover_report: first artifact must be the plain leg, "
            "second a routed leg"
        )
    if plain.get("sf") != routed.get("sf"):
        sys.exit("crossover_report: SF mismatch between legs")

    _ensure_loaded()
    qp, qr = plain["queries"], routed["queries"]
    common = [n for n in qp if n in qr and n in REGISTRY]
    groups: dict[str, list[str]] = {"routed": [], "control": [], "unknown": []}
    for n in common:
        groups[_group(n)].append(n)

    out = {
        "sf": plain["sf"],
        "plain_total": plain["value"],
        "routed_total": routed["value"],
        "plain_passes": plain["config"]["pass_totals"],
        "routed_passes": routed["config"]["pass_totals"],
        "groups": {g: _stats(ns, qp, qr) for g, ns in groups.items()},
        "control_queries": sorted(groups["control"]),
    }
    # ADVICE r13: enforce the bench_merge parity invariant here rather
    # than in prose — min-of-4 vs min-of-2 systematically favors the
    # deeper leg, so an asymmetric comparison must carry an explicit
    # warning field in the output.
    if len(out["plain_passes"]) != len(out["routed_passes"]):
        out["asymmetric_passes"] = {
            "plain": len(out["plain_passes"]),
            "routed": len(out["routed_passes"]),
            "warning": "min-of-N asymmetry systematically favors the "
            "leg with more passes; treat ratios as bounds, not "
            "estimates",
        }
    rg, cg = out["groups"]["routed"], out["groups"]["control"]
    if rg and cg:
        out["corrected"] = {
            "median": round(rg["median"] / cg["median"], 3),
            "total": round(rg["total"] / cg["total"], 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
