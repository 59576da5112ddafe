"""r23 PageRank vs an independently-written fixed-point reference:
the test plants a tiny customer-supplier graph as parquet and re-runs
the SAME defined algorithm (integer mass, div-floor contributions,
(15b+85i)//100 damping) in plain Python dicts — no Spark, no shared
code — then asserts exact equality and the hub-ranks-highest shape."""

from __future__ import annotations

import datetime

from batch_processing_system_spark.queries.graphs import (
    _ITERS,
    _MASS,
    r23_pagerank,
)

_TS = datetime.datetime(2024, 1, 1)


def _plant(spark, tmp_path, pairs):
    """pairs: iterable of (custkey, suppkey) trade relations."""
    orows, lrows = [], []
    for i, (c, s) in enumerate(pairs):
        okey = 100 + i
        orows.append((okey, c, "O", 1.0, _TS, "1-URGENT"))
        lrows.append((okey, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _TS))
    spark.createDataFrame(
        orows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lrows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def _reference_pagerank(pairs):
    """Independent fixed-point PageRank: same defined integer rules,
    plain dict/loop mechanics."""
    edges = []
    for c, s in set(pairs):
        edges.append((f"C{c}", f"S{s}"))
        edges.append((f"S{s}", f"C{c}"))
    deg: dict[str, int] = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    base = _MASS // len(deg)
    rank = {v: base for v in deg}
    for _ in range(_ITERS):
        inc = {v: 0 for v in deg}
        for src, dst in edges:
            inc[dst] += rank[src] // deg[src]
        rank = {v: (15 * base + 85 * inc[v]) // 100 for v in deg}
    return rank


class TestPagerank:
    PAIRS = [(1, 10), (2, 10), (3, 10), (3, 20), (4, 20)]

    def test_matches_independent_reference_exactly(self, spark, tmp_path):
        _plant(spark, tmp_path, self.PAIRS)
        got = {
            r["node"]: r["rank"]
            for r in r23_pagerank(spark, str(tmp_path)).collect()
        }
        assert got == _reference_pagerank(self.PAIRS)

    def test_hub_ranks_highest_and_mass_leak_bounded(self, spark, tmp_path):
        _plant(spark, tmp_path, self.PAIRS)
        rows = r23_pagerank(spark, str(tmp_path)).collect()
        assert rows[0]["node"] == "S10"  # degree-3 hub
        total = sum(r["rank"] for r in rows)
        # floor division leaks < 1 unit per node per step (contrib)
        # plus < 1 per node per damping — bound: 2 * n * iters + n
        n = len(rows)
        assert _MASS - total < 2 * n * _ITERS + n
        assert total <= _MASS

    def test_duplicate_trades_make_one_edge(self, spark, tmp_path):
        # the same (cust, supp) pair across many orders must not
        # inflate degree: distinct-pairs is part of the definition
        _plant(spark, tmp_path, self.PAIRS + [(1, 10)] * 5)
        got = {
            r["node"]: r["rank"]
            for r in r23_pagerank(spark, str(tmp_path)).collect()
        }
        assert got == _reference_pagerank(self.PAIRS)

    def test_rank_state_broadcast_is_size_guarded(self, spark, tmp_path):
        # VERDICT r7/r8: unconditionally broadcasting node-sized rank
        # state is an OOM on a billion-node graph. Under a 1-byte
        # budget the superstep join must plan WITHOUT a broadcast of
        # the rank state — and still produce the exact answer.
        from pyspark.sql import functions as F

        from batch_processing_system_spark.queries.graphs import (
            _state_join_strategy,
        )

        edges = spark.createDataFrame(
            [("C1", "S10"), ("S10", "C1")], "src string, dst string"
        )
        ranks = spark.createDataFrame(
            [("C1", 1, 100), ("S10", 1, 100)],
            "node string, deg int, rank bigint",
        )

        def _superstep_plan(budget):
            hinted = _state_join_strategy(2, budget)
            j = edges.join(hinted(ranks), edges.src == ranks.node).select(
                F.col("dst"), F.expr("rank div deg").alias("c")
            )
            return j._jdf.queryExecution().executedPlan().toString()

        assert "BroadcastExchange" in _superstep_plan(10**9)
        lowered = _superstep_plan(1)
        assert "BroadcastExchange" not in lowered, lowered
        assert "ShuffledHashJoin" in lowered, lowered
        # end-to-end: the shuffle-hash path computes the same ranks
        _plant(spark, tmp_path, self.PAIRS)
        got = {
            r["node"]: r["rank"]
            for r in r23_pagerank(
                spark, str(tmp_path), broadcast_budget_bytes=1
            ).collect()
        }
        assert got == _reference_pagerank(self.PAIRS)
