"""tools/bench_merge.py contract (round-13 crossover kit): per-query
minima across artifacts, provenance retention, and the guard that
refuses to merge legs with different routing configs (which would
fabricate a run that never happened)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MERGE = REPO / "tools" / "bench_merge.py"


def _art(queries, routing_flags=None, sf=1.0, passes=(10.0,)):
    cfg = {
        "bucketed_routing": False,
        "partitioned_routing": False,
        "hybrid_routing": False,
        "repeat": len(passes),
        "pass_totals": list(passes),
    }
    cfg.update(routing_flags or {})
    return {
        "metric": "catalog_wall_clock",
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "config": cfg,
    }


def _run(out, *ins):
    return subprocess.run(
        [sys.executable, str(MERGE), str(out), *map(str, ins)],
        capture_output=True,
        text=True,
    )


def test_merges_per_query_minima_with_provenance(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    out = tmp_path / "out.json"
    a.write_text(json.dumps(_art({"q1": 2.0, "q2": 5.0}, passes=(7.0,))))
    b.write_text(json.dumps(_art({"q1": 3.0, "q2": 1.0}, passes=(4.0,))))
    r = _run(out, a, b)
    assert r.returncode == 0, r.stderr
    merged = json.loads(out.read_text())
    assert merged["queries"] == {"q1": 2.0, "q2": 1.0}
    assert merged["value"] == 3.0
    assert merged["config"]["pass_totals"] == [7.0, 4.0]
    assert [m["pass_totals"] for m in merged["config"]["merged_from"]] == [
        [7.0],
        [4.0],
    ]


def test_failed_query_in_one_artifact_takes_other_runs_min(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    out = tmp_path / "out.json"
    a.write_text(json.dumps(_art({"q1": -1.0})))
    b.write_text(json.dumps(_art({"q1": 4.0})))
    _run(out, a, b)
    assert json.loads(out.read_text())["queries"]["q1"] == 4.0


def test_refuses_routing_mismatch_and_sf_mismatch(tmp_path):
    plain = tmp_path / "plain.json"
    routed = tmp_path / "routed.json"
    other_sf = tmp_path / "sf3.json"
    out = tmp_path / "out.json"
    plain.write_text(json.dumps(_art({"q1": 1.0})))
    routed.write_text(
        json.dumps(_art({"q1": 1.0}, routing_flags={"hybrid_routing": True}))
    )
    other_sf.write_text(json.dumps(_art({"q1": 1.0}, sf=3.0)))
    assert _run(out, plain, routed).returncode != 0
    assert _run(out, plain, other_sf).returncode != 0
    assert not out.exists()


def test_refuses_different_query_sets(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    out = tmp_path / "out.json"
    a.write_text(json.dumps(_art({"q1": 1.0})))
    b.write_text(json.dumps(_art({"q2": 1.0})))
    assert _run(out, a, b).returncode != 0
