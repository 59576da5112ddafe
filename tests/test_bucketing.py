"""Bucketed-table co-location (engine/bucketing.py, r67): the claim is
structural — bucketing must REMOVE the Exchange from bucket-key joins
and aggregations while leaving the answers bit-identical to the
unbucketed plan. Plans are asserted on the pre-execution physical
plan (AQE only re-plans at runtime; an Exchange absent here is absent
forever)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine.bucketing import (
    bucketed_pair,
    bucketed_table,
)
from batch_processing_system_spark.engine.io import load_table

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange assertions are about
    bucketing, not about the tiny fixture fitting under the
    broadcast threshold."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _per_order(orders, lineitem):
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


class TestBucketedPlans:
    def test_join_and_agg_have_zero_exchange(self, no_broadcast):
        spark = no_broadcast
        orders, lineitem = bucketed_pair(spark, SF_SMALL, n_buckets=8)
        plan = _plan(_per_order(orders, lineitem))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

    def test_unbucketed_twin_must_shuffle(self, no_broadcast):
        spark = no_broadcast
        orders = load_table(spark, SF_SMALL, "orders")
        lineitem = load_table(spark, SF_SMALL, "lineitem")
        plan = _plan(_per_order(orders, lineitem))
        assert "Exchange" in plan

    def test_within_bucket_sort_skips_join_sort(self, no_broadcast):
        # sortBy at write time is recorded in the catalog: the
        # SortMergeJoin consumes the bucketed scans with no Sort
        # operator either (write once, pre-sorted forever).
        spark = no_broadcast
        orders, lineitem = bucketed_pair(spark, SF_SMALL, n_buckets=8)
        plan = _plan(
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Sort " not in plan, plan

    def test_mismatched_bucket_counts_coalesce(self, no_broadcast):
        # tables written at different generations (4 vs 8 buckets)
        # still join shuffle-free when the ratio is integral:
        # coalesceBucketsInJoin reads the 8-bucket side 2:1.
        spark = no_broadcast
        conf = "spark.sql.bucketing.coalesceBucketsInJoin.enabled"
        old = spark.conf.get(conf)
        spark.conf.set(conf, "true")
        try:
            ob = bucketed_table(
                spark, SF_SMALL, "orders", "o_orderkey", 4,
                sort_cols=("o_orderkey",),
            )
            lineitem = bucketed_pair(spark, SF_SMALL, n_buckets=8)[1]
            plan = _plan(
                spark.table(ob).join(
                    lineitem, F.col("o_orderkey") == F.col("l_orderkey")
                )
            )
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set(conf, old)


class TestBucketedCorrectness:
    def test_bucketed_equals_unbucketed(self, spark):
        orders_b, lineitem_b = bucketed_pair(spark, SF_SMALL, n_buckets=8)
        orders = load_table(spark, SF_SMALL, "orders")
        lineitem = load_table(spark, SF_SMALL, "lineitem")
        got = sorted(
            _per_order(orders_b, lineitem_b).collect(),
            key=lambda r: r.o_orderkey,
        )
        want = sorted(
            _per_order(orders, lineitem).collect(),
            key=lambda r: r.o_orderkey,
        )
        assert got == want

    def test_registration_is_idempotent(self, spark):
        a = bucketed_table(
            spark, SF_SMALL, "orders", "o_orderkey", 8,
            sort_cols=("o_orderkey",),
        )
        b = bucketed_table(
            spark, SF_SMALL, "orders", "o_orderkey", 8,
            sort_cols=("o_orderkey",),
        )
        assert a == b
        assert spark.catalog.tableExists(a)

    def test_layout_spec_is_part_of_identity(self, spark):
        # re-requesting with a different bucket column or sort order
        # must NOT silently reuse the old files (ADVICE r7)
        a = bucketed_table(
            spark, SF_SMALL, "orders", "o_orderkey", 8,
            sort_cols=("o_orderkey",),
        )
        b = bucketed_table(spark, SF_SMALL, "orders", "o_orderkey", 8)
        c = bucketed_table(spark, SF_SMALL, "orders", "o_custkey", 8)
        assert len({a, b, c}) == 3

    def test_fresh_session_reuses_files_without_rewrite(self, spark):
        import os

        from batch_processing_system_spark.engine.bucketing import _BUCKET_ROOT

        name = bucketed_table(
            spark, SF_SMALL, "orders", "o_orderkey", 8,
            sort_cols=("o_orderkey",),
        )
        path = os.path.join(_BUCKET_ROOT, name)
        before = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}
        # dropping the (external) table simulates a fresh session's
        # empty in-memory catalog; the parquet files stay on disk
        spark.sql(f"DROP TABLE {name}")
        assert not spark.catalog.tableExists(name)
        name2 = bucketed_table(
            spark, SF_SMALL, "orders", "o_orderkey", 8,
            sort_cols=("o_orderkey",),
        )
        assert name2 == name
        assert spark.catalog.tableExists(name)
        after = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}
        assert after == before  # re-registered, not rewritten
        # and the DDL-registered table still plans shuffle- and
        # sort-free (the catalog metadata round-trips the layout)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            lineitem = bucketed_pair(spark, SF_SMALL, n_buckets=8)[1]
            plan = _plan(
                spark.table(name).join(
                    lineitem, F.col("o_orderkey") == F.col("l_orderkey")
                )
            )
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert "Sort " not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
