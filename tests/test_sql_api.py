"""The SQL API surface: spark.sql over registered views must produce
the same results as the DataFrame-built catalog queries (they compile
to the same logical plans — SURVEY §3.4)."""

from __future__ import annotations

from batch_processing_system_spark.engine.catalog import register_tables
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

from .conftest import SF_SMALL

_ensure_loaded()


def _same(df_a, df_b):
    return sorted(map(tuple, df_a.collect())) == sorted(map(tuple, df_b.collect()))


class TestSqlApi:
    def test_register_tables(self, spark):
        names = register_tables(spark, SF_SMALL)
        assert len(names) == 10
        assert spark.sql("SELECT COUNT(*) FROM orders").collect()[0][0] == 1500

    def test_sql_equals_dataframe_q18(self, spark):
        register_tables(spark, SF_SMALL)
        sql_form = spark.sql(
            """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS count_order,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_disc
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            """
        )
        assert _same(sql_form, REGISTRY["q18"].fn(spark, SF_SMALL))

    def test_sql_equals_dataframe_q25_window(self, spark):
        register_tables(spark, SF_SMALL)
        sql_form = spark.sql(
            """
            SELECT user_id, event_id FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
            """
        )
        assert _same(sql_form, REGISTRY["q25"].fn(spark, SF_SMALL))

    def test_sql_join_semi_anti_syntax(self, spark):
        register_tables(spark, SF_SMALL)
        semi = spark.sql(
            "SELECT c_custkey, c_name FROM customer SEMI JOIN orders ON c_custkey = o_custkey"
        )
        assert _same(semi, REGISTRY["q10"].fn(spark, SF_SMALL))
        anti = spark.sql(
            "SELECT c_custkey FROM customer ANTI JOIN orders ON c_custkey = o_custkey"
        )
        assert _same(anti, REGISTRY["q09"].fn(spark, SF_SMALL))

    def test_prefixed_coexisting_scale_factors(self, spark):
        register_tables(spark, SF_SMALL, prefix="a_")
        register_tables(spark, SF_SMALL, prefix="b_")
        n = spark.sql(
            "SELECT (SELECT COUNT(*) FROM a_orders) = (SELECT COUNT(*) FROM b_orders)"
        ).collect()[0][0]
        assert n is True
