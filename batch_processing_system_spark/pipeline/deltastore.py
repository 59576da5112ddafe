"""Delta Lake backend for the S5 upsert store — the production
table-format lane behind the same API as pipeline/commitstore.py.

The reference's update-in-place contract
(/root/reference/README.md:100-102) is served engine-native by the
hand-rolled commitstore (bucketed staging + manifest commits,
optimistic concurrency, vacuum/compact). At 100 TB a real deployment
reaches for a standard table format instead, where the same
expressions run inside ``MERGE INTO``:

    MERGE INTO docs d USING updates u ON d._id = u.custom_id
    WHEN MATCHED AND d.<status_field> = '<in_progress>'
    THEN UPDATE SET
        <status_field> = u.new_status,
        event_response = CASE WHEN u.new_item IS NOT NULL
            THEN concat(coalesce(d.event_response, array()),
                        array(u.new_item))
            ELSE d.event_response END

This module implements exactly that behind init/read/upsert functions
mirroring commitstore's, so the test matrix
(tests/test_commitstore.py) parametrizes over both backends and runs
the Delta lane wherever ``delta-spark`` is importable.

AVAILABILITY IN THIS CONTAINER (recorded per round-6 VERDICT task 4):
``import delta`` fails, no delta-core/delta-spark jar exists under
$SPARK_HOME/jars, and package installation is unavailable in the
sandbox (no pip, no network). The lane therefore raises a named
NotImplementedError at require_delta() and the parametrized tests
skip with that reason — the code path is ready for a container that
ships the package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import status_field, status_values


def delta_available() -> bool:
    """The lane is live only when ALL THREE hold: ``delta-spark``
    imports, the ``SPARK_DELTA=1`` opt-in flag is set (ADVICE r14: the
    flag gates engine/session.py's extension wiring, so without it the
    session can't run MERGE INTO even if the package imports — and a
    half-broken delta install can't take down unrelated sessions), and
    — when a session is already active — that session was actually
    built WITH the Delta extension (ADVICE r15: getOrCreate returns a
    pre-flag session as-is, so flag+import alone would report the lane
    live while MERGE INTO fails with a confusing catalog error; set
    SPARK_DELTA=1 before the first SparkSession is created)."""
    import os

    if os.environ.get("SPARK_DELTA") != "1":
        return False
    try:
        import delta  # noqa: F401
    except Exception:
        return False
    active = SparkSession.getActiveSession()
    if active is not None:
        exts = active.conf.get("spark.sql.extensions", "") or ""
        return "DeltaSparkSessionExtension" in exts
    return True


def require_delta() -> None:
    if not delta_available():
        raise NotImplementedError(
            "deltastore: the 'delta-spark' package (and its jars) are "
            "not installed in this environment, or the SPARK_DELTA=1 "
            "opt-in flag is unset (it gates the session extension "
            "wiring in engine/session.py — it must be set BEFORE the "
            "first SparkSession is created, or the active session "
            "lacks the Delta extension and this check fails); the "
            "commitstore backend (pipeline/commitstore.py) is the "
            "system of record here"
        )


def init_store(docs: DataFrame, root: str) -> None:
    """Initial load: write the documents snapshot as a Delta table."""
    require_delta()
    docs.write.format("delta").mode("errorifexists").save(root)


def read_store(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Snapshot read (Delta time travel when ``version`` given)."""
    require_delta()
    r = spark.read.format("delta")
    if version is not None:
        r = r.option("versionAsOf", version)
    return r.load(root)


def upsert_store(spark: SparkSession, root: str, updates: DataFrame) -> None:
    """The S5 $push/$set upsert as a real ``MERGE INTO`` — identical
    semantics to pipeline.process.upsert_documents (the in_progress
    gate makes re-application idempotent; see that docstring)."""
    require_delta()
    from delta.tables import DeltaTable

    sfield = status_field()
    s_in_progress, _, _ = status_values()
    table = DeltaTable.forPath(spark, root)
    (
        table.alias("d")
        .merge(updates.alias("u"), "d._id = u.custom_id")
        .whenMatchedUpdate(
            condition=f"d.{sfield} = '{s_in_progress}' AND u.new_status IS NOT NULL",
            set={
                sfield: "u.new_status",
                "event_response": (
                    "CASE WHEN u.new_item IS NOT NULL THEN "
                    "concat(coalesce(d.event_response, array()), array(u.new_item)) "
                    "ELSE d.event_response END"
                ),
            },
        )
        .execute()
    )
