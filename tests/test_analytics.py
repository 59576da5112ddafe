"""Round-6 TPC-H silhouette additions (queries/analytics.py r30-r32):
rounding-margin evidence for the r31 share ratio (the r21
decimal→double rule) and planted-branch semantics for the Q19-style
disjunctive predicate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.analytics import (
    r31_market_share,
    r32_disjunctive_pred,
)
from tests.conftest import SF_SMALL

_TS = datetime.datetime(2024, 1, 1)


class TestMarketShareMargin:
    def test_share_is_far_from_4dp_boundaries(self, spark):
        # the ROUND(…, 4) outputs hash-match only if no share sits at
        # a half-boundary where a 1-ulp decimal→double difference
        # could flip the digit; measure the distance on real data
        for sf in (SF_SMALL, "/root/testdata/sf0.01"):
            rows = (
                r31_market_share(spark, sf)
                .select(
                    (F.col("target_rev") / F.col("total_rev")).alias("raw")
                )
                .collect()
            )
            assert rows
            for r in rows:
                frac = (r["raw"] * 10**4) % 1.0
                dist = abs(frac - 0.5)
                assert dist > 1e-6, (sf, r["raw"], dist)


class TestDisjunctivePredicate:
    def _plant(self, spark, tmp_path, parts, lines):
        spark.createDataFrame(
            parts, "p_partkey bigint, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "part.parquet")
        )
        spark.createDataFrame(
            [
                (i + 1, pk, 1, 1, float(q), 100.0, 0.0, 0.0, "N", "O", _TS)
                for i, (pk, q) in enumerate(lines)
            ],
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        return str(tmp_path)

    def test_each_branch_and_no_cross_branch_leak(self, spark, tmp_path):
        parts = [
            (1, "a", "Brand#1", "T", 5, 1.0),   # branch-1 part
            (2, "b", "Brand#2", "T", 20, 1.0),  # branch-2 part
            (3, "c", "Brand#3", "T", 40, 1.0),  # branch-3 part
            (4, "d", "Brand#4", "T", 5, 1.0),   # no branch
        ]
        lines = [
            (1, 10),   # brand1 size5 qty10: branch 1 hit
            (1, 30),   # qty 30 outside branch-1 bounds: miss
            (2, 30),   # branch 2 hit
            (2, 10),   # qty below: miss
            (3, 50),   # branch 3 hit (open-ended qty)
            (3, 20),   # qty below 35: miss
            (4, 10),   # brand not in any branch: miss
        ]
        sf = self._plant(spark, tmp_path, parts, lines)
        row = r32_disjunctive_pred(spark, sf).collect()[0]
        assert row["n_lines"] == 3
        assert row["revenue"] == 300.0
