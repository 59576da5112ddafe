"""Planted-corner-case tests for the TPC-H completion block
(queries/tpch.py r33-r42): each test fabricates a tiny table layout
where the interesting boundary is forced — tie-breaks, zero-match
outer rows, exactly-at-average customers, sole-vs-tied latest
suppliers — and asserts the query decides it the way the docstring
claims."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.tpch import (
    r36_custdist,
    r37_top_supplier,
    r38_small_qty_revenue,
    r40_idle_balances,
    r41_min_cost_supplier,
    r42_sole_latest_supplier,
)

_TS = datetime.datetime(1997, 2, 1)

LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)


def _li(ok, pk, sk, qty, price=100.0, ship=_TS, ln=1):
    return (ok, pk, sk, ln, float(qty), float(price), 0.0, 0.0, "N", "O", ship)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def _write_supplier(spark, tmp_path, rows):
    _write(
        spark, tmp_path, "supplier", rows,
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )


def _write_part(spark, tmp_path, rows):
    _write(
        spark, tmp_path, "part", rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


def _write_customer(spark, tmp_path, rows):
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )


def _write_orders(spark, tmp_path, rows):
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


class TestCustdistZeroRow:
    def test_customer_with_only_urgent_orders_counts_as_zero(
        self, spark, tmp_path
    ):
        # cust 1: two non-urgent orders; cust 2: ONLY an urgent order
        # (filtered by the join predicate -> must appear at c_count=0);
        # cust 3: no orders at all.
        _write_customer(
            spark, tmp_path,
            [(1, "a", 1, 0.0, "BUILDING"), (2, "b", 1, 0.0, "BUILDING"),
             (3, "c", 1, 0.0, "BUILDING")],
        )
        _write_orders(
            spark, tmp_path,
            [(10, 1, "O", 1.0, _TS, "5-LOW"), (11, 1, "O", 1.0, _TS, "5-LOW"),
             (12, 2, "O", 1.0, _TS, "1-URGENT")],
        )
        got = {
            r["c_count"]: r["custdist"]
            for r in r36_custdist(spark, str(tmp_path)).collect()
        }
        assert got == {0: 2, 2: 1}


class TestTopSupplierTies:
    def test_decimal_tie_returns_both_suppliers(self, spark, tmp_path):
        # suppliers 1 and 2 gross the same DECIMAL revenue via different
        # line splits; supplier 3 is strictly below.
        _write_supplier(
            spark, tmp_path,
            [(1, "s1", 1, 0.0), (2, "s2", 1, 0.0), (3, "s3", 1, 0.0)],
        )
        _write(
            spark, tmp_path, "lineitem",
            [
                _li(1, 1, 1, 1, price=100.0),
                _li(2, 1, 2, 1, price=60.0),
                _li(3, 1, 2, 1, price=40.0, ln=2),
                _li(4, 1, 3, 1, price=99.99),
            ],
            LINEITEM_SCHEMA,
        )
        rows = r37_top_supplier(spark, str(tmp_path)).collect()
        assert [r["s_suppkey"] for r in rows] == [1, 2]
        assert all(r["total_rev"] == 100.0 for r in rows)


class TestSmallQtyCrossMultiplication:
    def test_condition_matches_literal_average(self, spark, tmp_path):
        # part 1: quantities 10,10,10,70 -> avg 25, 0.2*avg = 5 ->
        # nothing qualifies (10 >= 5). part 2: 1,99 -> avg 50, gate 10
        # -> the qty-1 line qualifies. Strictness: part 3 has qty
        # exactly at 0.2*avg (1,1,1,1,16 -> avg 4, gate 0.8; plant a
        # qty-0.8-impossible -> instead 5,5,5,5,105: avg 25, gate 5,
        # the qty-5 lines must NOT qualify (strict <).
        _write_part(
            spark, tmp_path,
            [(1, "p1", "Brand#3", "SMALL", 1, 1.0),
             (2, "p2", "Brand#3", "SMALL", 1, 1.0),
             (3, "p3", "Brand#3", "SMALL", 1, 1.0)],
        )
        lines = (
            [_li(o, 1, 1, q) for o, q in zip((1, 2, 3, 4), (10, 10, 10, 70))]
            + [_li(o, 2, 1, q, price=7.0) for o, q in zip((5, 6), (1, 99))]
            + [_li(o, 3, 1, q) for o, q in zip(range(7, 12), (5, 5, 5, 5, 105))]
        )
        _write(spark, tmp_path, "lineitem", lines, LINEITEM_SCHEMA)
        row = r38_small_qty_revenue(spark, str(tmp_path)).collect()[0]
        assert row["n_lines"] == 1 and row["small_rev"] == 7.0


class TestIdleBalancesGate:
    def test_exactly_average_customer_is_excluded(self, spark, tmp_path):
        # positive balances 100, 200, 300 -> avg exactly 200; the
        # bal*n > total gate is strict, so cust 2 (bal=200) is out,
        # cust 3 (300) is in; cust 3 having a NON-urgent order keeps
        # it in (anti join filters urgent only); cust 4 (400) has an
        # urgent order -> out; negative-balance cust 5 never counts.
        _write_customer(
            spark, tmp_path,
            [(1, "a", 1, 100.0, "SEG"), (2, "b", 1, 200.0, "SEG"),
             (3, "c", 1, 300.0, "SEG"), (5, "e", 1, -50.0, "SEG")],
        )
        _write_orders(
            spark, tmp_path, [(10, 3, "O", 1.0, _TS, "5-LOW")],
        )
        rows = r40_idle_balances(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["n_cust"] == 1 and rows[0]["total_bal"] == 300.0

    def test_urgent_order_disqualifies(self, spark, tmp_path):
        _write_customer(
            spark, tmp_path,
            [(1, "a", 1, 100.0, "SEG"), (3, "c", 1, 300.0, "SEG"),
             (4, "d", 1, 400.0, "SEG")],
        )
        _write_orders(
            spark, tmp_path, [(11, 4, "O", 1.0, _TS, "1-URGENT")],
        )
        # avg = 800/3; qualifiers above it: 300 (no urgent) in, 400 out
        rows = r40_idle_balances(spark, str(tmp_path)).collect()
        assert rows[0]["n_cust"] == 1 and rows[0]["total_bal"] == 300.0


class TestMinCostSupplierTieBreak:
    def test_equal_acctbal_breaks_on_suppkey(self, spark, tmp_path):
        _write_part(spark, tmp_path, [(1, "p1", "Brand#1", "SMALL", 5, 1.0)])
        _write_supplier(
            spark, tmp_path, [(7, "s7", 1, 50.0), (3, "s3", 1, 50.0)],
        )
        _write(
            spark, tmp_path, "lineitem",
            [_li(1, 1, 7, 1), _li(2, 1, 3, 1)],
            LINEITEM_SCHEMA,
        )
        rows = r41_min_cost_supplier(spark, str(tmp_path)).collect()
        assert len(rows) == 1 and rows[0]["s_suppkey"] == 3

    def test_supplier_without_supply_row_is_ignored(self, spark, tmp_path):
        # supplier 1 is cheapest overall but never shipped part 1 —
        # the derived supply relation must exclude it.
        _write_part(spark, tmp_path, [(1, "p1", "Brand#1", "SMALL", 5, 1.0)])
        _write_supplier(
            spark, tmp_path, [(1, "s1", 1, 1.0), (2, "s2", 1, 99.0)],
        )
        _write(spark, tmp_path, "lineitem", [_li(1, 1, 2, 1)], LINEITEM_SCHEMA)
        rows = r41_min_cost_supplier(spark, str(tmp_path)).collect()
        assert len(rows) == 1 and rows[0]["s_suppkey"] == 2


class TestSoleLatestSupplier:
    def test_sole_vs_tied_vs_single_supplier(self, spark, tmp_path):
        d1 = datetime.datetime(1997, 1, 1)
        d2 = datetime.datetime(1997, 1, 2)
        _write_supplier(
            spark, tmp_path,
            [(1, "s1", 1, 0.0), (2, "s2", 1, 0.0), (3, "s3", 1, 0.0)],
        )
        _write(
            spark, tmp_path, "lineitem",
            [
                # order 10: suppliers 1,2; supplier 2 ships last alone -> counted
                _li(10, 1, 1, 1, ship=d1),
                _li(10, 1, 2, 1, ship=d2, ln=2),
                # order 11: suppliers 1,3 BOTH ship on the max date -> no one counted
                _li(11, 1, 1, 1, ship=d2),
                _li(11, 1, 3, 1, ship=d2, ln=2),
                # order 12: single supplier -> excluded (n_supp < 2)
                _li(12, 1, 3, 1, ship=d2),
                # order 13: supplier 2 again sole-latest -> counted
                _li(13, 1, 3, 1, ship=d1),
                _li(13, 1, 2, 1, ship=d2, ln=2),
            ],
            LINEITEM_SCHEMA,
        )
        rows = r42_sole_latest_supplier(spark, str(tmp_path)).collect()
        assert [(r["s_name"], r["numwait"]) for r in rows] == [("s2", 2)]

    def test_same_supplier_twice_at_max_is_still_sole(self, spark, tmp_path):
        d1 = datetime.datetime(1997, 1, 1)
        d2 = datetime.datetime(1997, 1, 2)
        _write_supplier(
            spark, tmp_path, [(1, "s1", 1, 0.0), (2, "s2", 1, 0.0)],
        )
        _write(
            spark, tmp_path, "lineitem",
            [
                # supplier 2 has TWO lines on the max date; distinct
                # count at max is still 1 -> sole
                _li(20, 1, 1, 1, ship=d1),
                _li(20, 1, 2, 1, ship=d2, ln=2),
                _li(20, 2, 2, 1, ship=d2, ln=3),
            ],
            LINEITEM_SCHEMA,
        )
        rows = r42_sole_latest_supplier(spark, str(tmp_path)).collect()
        assert [(r["s_name"], r["numwait"]) for r in rows] == [("s2", 1)]
