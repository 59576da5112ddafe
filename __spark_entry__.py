"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``batch_processing_system_spark.queries``
(SURVEY.md §2.4); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_system_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q18, TPC-H Q1-shape hash aggregation with
    DECIMAL-deterministic measures) on /root/testdata/sf0.001."""
    q = _catalog.queries()["q18"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per tier-1 query; tier-2 queries
    (float-accumulation / LSH randomness, SURVEY §2.4) are omitted so the
    driver records the weaker rows-only check."""
    return _catalog.oracle_sql()
