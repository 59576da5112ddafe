"""Planted-graph test for r52 BFS hop distances: a customer-supplier
chain whose far end exceeds the superstep budget, plus a disconnected
island — distances, the budget cutoff, and unreachable counting all
pinned."""

from __future__ import annotations

import datetime

from batch_processing_system_spark.queries.graphs import (
    _BFS_HOPS,
    r52_bfs_hops,
)

_TS = datetime.datetime(1997, 1, 1)


def _write_chain(spark, tmp_path, cs_pairs):
    """Each (custkey, suppkey) pair becomes one order + one lineitem."""
    orders = [
        (i + 1, c, "O", 1.0, _TS, "5-LOW") for i, (c, _) in enumerate(cs_pairs)
    ]
    lines = [
        (i + 1, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _TS)
        for i, (_, s) in enumerate(cs_pairs)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )


class TestBfsHops:
    def test_chain_cutoff_and_island(self, spark, tmp_path):
        # path: C1-S1-C2-S2-C3-S3-C4-S4  (hops 0..7; S4 at hop 7 is
        # PAST the budget of 6 -> must report -1), plus island C9-S9
        chain = [(1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 4)]
        island = [(9, 9)]
        _write_chain(spark, tmp_path, chain + island)
        got = {
            r["hops"]: r["n_nodes"]
            for r in r52_bfs_hops(spark, str(tmp_path)).collect()
        }
        assert _BFS_HOPS == 6  # the planted chain is sized for this budget
        # hops 0..6 are one node each (C1,S1,C2,S2,C3,S3,C4);
        # unreachable: S4 (hop 7, past budget) + island C9, S9
        expected = {h: 1 for h in range(7)}
        expected[-1] = 3
        assert got == expected

    def test_star_is_all_within_two(self, spark, tmp_path):
        # one supplier shared by 5 customers: S1 at hop 1, the other
        # customers at hop 2 — frontier dedup must not double-count
        _write_chain(spark, tmp_path, [(c, 1) for c in range(1, 6)])
        got = {
            r["hops"]: r["n_nodes"]
            for r in r52_bfs_hops(spark, str(tmp_path)).collect()
        }
        assert got == {0: 1, 1: 1, 2: 4}
