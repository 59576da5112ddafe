"""tools/crossover_report.py contract: static table attribution puts
embeddings-only queries in the control group and bucketed/hybrid-table
consumers in the routed group, and the leg-order guard refuses a
routed-first invocation."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "crossover_report.py"


def test_group_attribution():
    sys.path.insert(0, str(REPO))
    from tools.crossover_report import _group
    from batch_processing_system_spark.queries import _ensure_loaded

    _ensure_loaded()
    # q54 reads only embeddings -> control (embeddings routes plain
    # under every flag); q66/q78 read bucketed tables -> routed
    assert _group("q54_cosine_neardup") == "control"
    assert _group("q66_returned_value") == "routed"
    assert _group("q78_contamination") == "routed"


def test_corrected_ratio_and_leg_order_guard(tmp_path):
    def art(times, routed_flag):
        return {
            "metric": "catalog_wall_clock",
            "value": sum(times.values()),
            "unit": "sec",
            "queries": times,
            "sf": 1.0,
            "config": {
                "bucketed_routing": routed_flag,
                "partitioned_routing": False,
                "hybrid_routing": routed_flag,
                "pass_totals": [sum(times.values())],
            },
        }

    # routed-table query halves, control query also drops 20% (drift)
    plain = tmp_path / "plain.json"
    routed = tmp_path / "routed.json"
    plain.write_text(
        json.dumps(art({"q66_returned_value": 4.0, "q54_cosine_neardup": 2.0}, False))
    )
    routed.write_text(
        json.dumps(art({"q66_returned_value": 2.0, "q54_cosine_neardup": 1.6}, True))
    )
    r = subprocess.run(
        [sys.executable, str(TOOL), str(plain), str(routed)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["groups"]["routed"]["total"] == 0.5
    assert out["groups"]["control"]["total"] == 0.8
    assert out["corrected"]["total"] == round(0.5 / 0.8, 3)

    wrong = subprocess.run(
        [sys.executable, str(TOOL), str(routed), str(plain)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert wrong.returncode != 0
