"""SQL entry point (SURVEY §3.4: "(b) spark.sql(...) — parsed by
Catalyst's SQL parser into the same unresolved logical plan").

``register_tables`` exposes the testdata layout as temp views so the
whole engine surface is reachable from SQL strings, not just the
DataFrame API — both forms land on identical Catalyst plans, which
``tests/test_sql_api.py`` asserts by value.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .io import TABLES, load_table


def register_functions(spark: SparkSession) -> list[str]:
    """Register the engine's SQL-callable Python UDTFs (U4) so SQL
    strings can use them alongside the temp views — e.g.
    ``SELECT d.doc_id, c.* FROM documents d, LATERAL
    chunk_text(d.text, 32) c``."""
    from ..functions.udtfs import register_udtfs

    return register_udtfs(spark)


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per testdata table. Returns the
    view names. With a ``prefix``, multiple scale factors can coexist
    in one session (e.g. ``sf001_orders``)."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


#: the relational tables whose columns all take ANALYZE column stats
#: (documents/embeddings carry long text / array columns that column
#: statistics don't cover)
RELATIONAL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
)


def register_analyzed_tables(
    spark: SparkSession, sf_dir: str, prefix: str = "cbo_", tables=None
) -> list[str]:
    """Catalog-register the testdata tables (CREATE TABLE ... USING
    parquet LOCATION) and ANALYZE them — table-level row counts/sizes
    plus per-column NDV/min/max. Path-based parquet reads carry NO
    statistics, which leaves the cost-based optimizer inert; this is
    the one-time step that arms CBO's join reordering for the
    multi-join silhouettes (q65/r35/r42 shapes). Idempotent
    (DROP IF EXISTS first); returns the catalog table names."""
    import os

    names = []
    for t in tables or RELATIONAL_TABLES:
        name = f"{prefix}{t}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} USING parquet "
            f"LOCATION '{os.path.join(sf_dir, t + '.parquet')}'"
        )
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        names.append(name)
    return names
