"""Round-14 additions (VERDICT r13 task list):

- item 4: the sampled-profile loop closed END-TO-END at sf1 — a 1%
  seeded profile of the 30%-hot-key twin detects exactly the same hot
  list as the full profile, and r71 built from the sampled list is
  row-identical to the plain join (the mitigation contract). The sf1
  corpus is repo-local (tools/make_sf.py, gitignored); the test skips
  where it has not been generated.
- bench tail line: carries the compact per-query value array (item 9)
  and stays under the driver's 2000-char stdout window.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF1 = str(REPO / ".localdata" / "sf1")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF1, "events.parquet")),
    reason="sf1 corpus not generated (python tools/make_sf.py --sf 1)",
)
class TestSampledProfileAtSF1:
    def test_one_pct_sample_matches_full_profile_and_r71(self, spark):
        from batch_processing_system_spark.engine.skew import detect_hot_keys
        from batch_processing_system_spark.queries.aggregates import (
            _hot_key_events,
            r71_salted_hot_join,
        )

        probe = _hot_key_events(spark, SF1).select("k", "event_id")
        full = detect_hot_keys(probe, "k", min_share=0.1)
        sampled = detect_hot_keys(
            probe, "k", min_share=0.1, sample_fraction=0.01
        )
        # the planted 30%-mass key — and nothing else — survives both
        # profiles: share-of-mass is the sampling-stable criterion
        assert sampled == full == [7]
        # mitigation built from the SAMPLED profile equals the plain
        # join (the salted_broadcast_left contract, now pinned at sf1)
        got = r71_salted_hot_join(spark, SF1, hot_keys=sampled).collect()
        from pyspark.sql import functions as F

        from batch_processing_system_spark.engine.io import load_table

        dim = load_table(spark, SF1, "customer").select(
            F.col("c_custkey").alias("k"), "c_mktsegment"
        )
        want = (
            probe.join(dim, "k")
            .groupBy("c_mktsegment")
            .agg(
                F.count("event_id").cast("bigint").alias("n_events"),
                F.sum("event_id").cast("bigint").alias("sum_event_id"),
                F.countDistinct("k").cast("bigint").alias("n_keys"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bench_tail_line_fits_driver_window():
    """The last stdout line of bench.py must parse as JSON and fit the
    driver's 2000-char tail window WITH the inline per-query array
    (VERDICT r13 item 9). Exercised against the committed sf0.1
    artifact so the check tracks catalog growth."""
    art = REPO / ".benchmarks" / "bench_sf0.1.json"
    if not art.exists():
        pytest.skip("no committed sf0.1 artifact")
    payload = json.loads(art.read_text())
    pq = payload["queries"]
    line = {
        "metric": "catalog_wall_clock",
        "value": payload["value"],
        "unit": "sec",
        "n": len(pq),
        "failed": 0,
        "sf": payload["sf"],
        "repeat": 2,
        "per_query": ".benchmarks/bench_sf0.1.json",
        "pq_order": "sorted_names",
        "pq": [round(pq[k], 2) for k in sorted(pq)],
    }
    assert len(json.dumps(line)) <= 1900
