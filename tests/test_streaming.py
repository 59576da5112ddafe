"""Streaming tests: batch/stream equivalence of the window builders,
a real micro-batch run through readStream→memory sink, the stateful
poll-cycle MERGE, and applyInPandasWithState."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.streaming.state import (
    poll_stream_to_state,
    running_counts_stateful,
)
from batch_processing_system_spark.streaming.windows import (
    sessionized_counts,
    sliding_counts,
    tumbling_counts,
)

from .conftest import SF_SMALL

EVENTS_DDL = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


class TestBatchEquivalence:
    """window()/session_window() run as plain batch expressions must
    agree with the oracle-checked batch queries (q39/q40)."""

    def test_tumbling_matches_q39(self, spark):
        events = load_table(spark, SF_SMALL, "events")
        stream_form = tumbling_counts(events).select(
            F.col("w.start").alias("hour_bucket"), "event_type", "cnt", "sum_value"
        )
        from batch_processing_system_spark.queries.temporal import q39

        batch_form = q39(spark, SF_SMALL)
        assert sorted(map(tuple, stream_form.collect())) == sorted(
            map(tuple, batch_form.collect())
        )

    def test_session_count_matches_q40(self, spark):
        events = load_table(spark, SF_SMALL, "events")
        sessions = (
            sessionized_counts(events)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        )
        from batch_processing_system_spark.queries.temporal import q40

        assert sorted(map(tuple, sessions.collect())) == sorted(
            map(tuple, q40(spark, SF_SMALL).collect())
        )

    def test_sliding_window_multiplicity(self, spark):
        events = load_table(spark, SF_SMALL, "events")
        total = load_table(spark, SF_SMALL, "events").count()
        slid = sliding_counts(events, "2 hours", "1 hour")
        # every event falls into exactly window/slide = 2 buckets
        assert slid.agg(F.sum("cnt")).collect()[0][0] == 2 * total


def _write_event_files(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    for i, batch in enumerate(rows):
        with open(dirpath / f"part-{i}.json", "w") as f:
            for r in batch:
                f.write(json.dumps(r) + "\n")


class TestMicroBatch:
    def test_tumbling_over_file_stream(self, spark, tmp_path):
        src = tmp_path / "stream-in"
        _write_event_files(
            src,
            [
                [
                    {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1,
                     "event_type": "view", "value": 1.0},
                    {"event_id": 2, "ts": "2024-01-01T00:20:00", "user_id": 1,
                     "event_type": "view", "value": 2.0},
                    {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 2,
                     "event_type": "click", "value": 3.0},
                ]
            ],
        )
        stream = (
            spark.readStream.schema(EVENTS_DDL).json(str(src))
        )
        agg = tumbling_counts(stream, "1 hour", "2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {
            (r["w"]["start"].hour, r["event_type"]): (r["cnt"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
        assert out[(0, "view")] == (2, 3.0)
        assert out[(1, "click")] == (1, 3.0)


class TestStatefulPoll:
    def test_stream_merges_into_jobs_table(self, spark, tmp_path):
        from batch_processing_system_spark.pipeline.schemas import BATCH_JOB_SCHEMA

        T0 = datetime(2024, 1, 1, 12, 0, 0)
        jobs_path = str(tmp_path / "jobs")
        rows = [
            ("job-1", "b-1", "f", None, None, "submitted", None, "{}", "u", "c", "m", T0, T0),
            ("job-2", "b-2", "f", None, None, "submitted", None, "{}", "u", "c", "m", T0, T0),
        ]
        spark.createDataFrame(rows, BATCH_JOB_SCHEMA).write.parquet(jobs_path)

        src = tmp_path / "updates"
        _write_event_files(
            src, [[{"_id": "job-1", "openai_status": "failed"}]]
        )
        stream = spark.readStream.schema("_id string, openai_status string").json(str(src))
        q = poll_stream_to_state(stream, jobs_path, str(tmp_path / "ckpt")).start()
        q.awaitTermination(120)

        state = {r["_id"]: r for r in spark.read.parquet(jobs_path).collect()}
        assert state["job-1"]["status"] == "failed"
        assert state["job-1"]["openai_status"] == "failed"
        assert state["job-2"]["status"] == "submitted"  # untouched


class TestApplyInPandasWithState:
    def test_running_counts(self, spark, tmp_path):
        src = tmp_path / "ev"
        _write_event_files(
            src,
            [
                [
                    {"event_id": 1, "ts": "2024-01-01T00:00:01", "user_id": 7,
                     "event_type": "view", "value": 0.0},
                    {"event_id": 2, "ts": "2024-01-01T00:00:02", "user_id": 7,
                     "event_type": "view", "value": 0.0},
                    {"event_id": 3, "ts": "2024-01-01T00:00:03", "user_id": 9,
                     "event_type": "view", "value": 0.0},
                ]
            ],
        )
        stream = spark.readStream.schema(EVENTS_DDL).json(str(src))
        q = (
            running_counts_stateful(stream)
            .writeStream.format("memory")
            .queryName("counts_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {
            r["user_id"]: r["total_events"]
            for r in spark.sql("SELECT * FROM counts_test").collect()
        }
        assert out == {7: 2, 9: 1}
