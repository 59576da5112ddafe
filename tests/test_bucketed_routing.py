"""Load-bearing bucketed routing (engine/io.py BUCKET_SPECS): with
SPARK_GRAFT_BUCKETED set, heavy catalog queries read events/documents
from bucketed catalog tables. Contract: answers are hash-identical to
the plain-parquet path, and the key-keyed joins/aggs lose Exchanges
(counted on the pre-execution physical plan, broadcast disabled so
the comparison is structural, not threshold luck)."""

from __future__ import annotations

import os

import pytest

from batch_processing_system_spark.queries.curation import q75_curation_pipeline
from batch_processing_system_spark.queries.relational import q07, q09
from batch_processing_system_spark.queries.temporal import q96_retention
from batch_processing_system_spark.queries.tpch import (
    r34_priority_waiting,
    r36_custdist,
    r39_large_orders,
    r65_ship_latency,
)

from .conftest import SF_SMALL

_FLAG = "SPARK_GRAFT_BUCKETED"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _routed(fn, spark, on: bool):
    old = os.environ.get(_FLAG)
    os.environ[_FLAG] = "1" if on else "0"
    try:
        return fn(spark, SF_SMALL)
    finally:
        if old is None:
            del os.environ[_FLAG]
        else:
            os.environ[_FLAG] = old


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


class TestBucketedRouting:
    @pytest.mark.parametrize(
        "fn",
        [
            q96_retention,
            q75_curation_pipeline,
            # r10: the orderkey-bucketed TPC-H family
            r34_priority_waiting,
            r39_large_orders,
            r65_ship_latency,
            # r11: the custkey-bucketed customer family
            q07,
            q09,
            r36_custdist,
        ],
    )
    def test_answers_identical_both_paths(self, spark, fn):
        assert _rows(_routed(fn, spark, True)) == _rows(
            _routed(fn, spark, False)
        )

    @pytest.mark.parametrize("fn", [q07, q09, r36_custdist])
    def test_customer_side_loses_exchange(self, no_broadcast, fn):
        # customer bucketed by c_custkey (r11): the customer-side
        # Exchange of the customer⋈orders joins disappears (the orders
        # side still shuffles on o_custkey — its own bucketing is on
        # o_orderkey)
        spark = no_broadcast
        plain = _exchanges(_routed(fn, spark, False))
        routed = _exchanges(_routed(fn, spark, True))
        assert routed < plain, (fn.__name__, routed, plain)

    @pytest.mark.parametrize(
        "fn", [r34_priority_waiting, r39_large_orders, r65_ship_latency]
    )
    def test_tpch_orderkey_joins_lose_exchanges(self, no_broadcast, fn):
        # orders/lineitem both bucketed+sorted by the order key: the
        # fact⋈fact SortMergeJoin consumes the bucketed scans with no
        # re-shuffle of either side
        spark = no_broadcast
        plain = _exchanges(_routed(fn, spark, False))
        routed = _exchanges(_routed(fn, spark, True))
        assert routed < plain, (fn.__name__, routed, plain)

    def test_r65_join_needs_no_sort_either(self, no_broadcast):
        # sortBy(orderkey) at write time: the SMJ's per-side Sort
        # operators disappear along with the Exchanges
        spark = no_broadcast

        def sorts_feeding_join(df) -> int:
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Sort [o_orderkey") + plan.count(
                "Sort [l_orderkey"
            )

        plain = _routed(r65_ship_latency, spark, False)
        routed = _routed(r65_ship_latency, spark, True)
        assert sorts_feeding_join(plain) >= 2
        assert sorts_feeding_join(routed) == 0

    def test_q96_loses_exchanges(self, no_broadcast):
        spark = no_broadcast
        plain = _exchanges(_routed(q96_retention, spark, False))
        routed = _exchanges(_routed(q96_retention, spark, True))
        # bucketed-by-user_id scan feeds the cohort agg, the
        # cohort⋈activity join, and the distinct without re-shuffling
        assert routed < plain, (routed, plain)

    def test_q75_wide_corpus_shuffle_is_gone(self, no_broadcast):
        # q75's total Exchange count is unchanged (a narrow doc_id-only
        # distinct gets re-partitioned 8→32 instead), but the 100 TB
        # cost driver — shuffling the WIDE corpus projection (text-
        # derived row) into the dedup anti-join — disappears: the
        # bucketed scan feeds the SortMergeJoin directly.
        spark = no_broadcast

        def wide_shuffle(df) -> bool:
            lines = (
                df._jdf.queryExecution().executedPlan().toString().splitlines()
            )
            return any(
                "Exchange hashpartitioning(doc_id" in l
                and "split(text" in lines[i + 1]
                for i, l in enumerate(lines[:-1])
            )

        plain = _routed(q75_curation_pipeline, spark, False)
        routed = _routed(q75_curation_pipeline, spark, True)
        assert wide_shuffle(plain)
        assert not wide_shuffle(routed)
        assert "Bucketed: true" in (
            routed._jdf.queryExecution().executedPlan().toString()
        )

    def test_flag_off_is_plain_parquet_scan(self, spark):
        plan = (
            _routed(q96_retention, spark, False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "bkt_events" not in plan
