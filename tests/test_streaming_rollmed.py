"""Batch≡stream equality for the rolling-median twin
(streaming/rollmed.py vs r44): time-ordered 3-wave replay of the
sf0.001 purchase log, each wave a separate run restarting from the
checkpoint; the append-only median log must equal r44 exactly, and
wave-1 rows must already be final."""

from __future__ import annotations

import json
import shutil

import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine.det import epoch_us
from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.wrangling import r44_rolling_median
from batch_processing_system_spark.streaming.rollmed import run_rollmed_stream

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def waves(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rollmedwaves")
    rows = (
        load_table(spark, SF_SMALL, "events")
        .where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "event_id", "value", epoch_us("ts").alias("eu"))
        .orderBy("eu", "event_id")
        .collect()
    )
    n = len(rows)
    bounds = [0, n // 3, 2 * n // 3, n]
    paths = []
    for i in range(3):
        p = d / f"wave{i}.jsonl"
        p.write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": r["user_id"],
                        "event_id": r["event_id"],
                        "value": r["value"],
                        "eu": r["eu"],
                    }
                )
                for r in rows[bounds[i] : bounds[i + 1]]
            )
            + "\n"
        )
        paths.append(str(p))
    return d, paths


def _rows(df):
    return {
        (r["event_id"], r["user_id"], r["med7"]) for r in df.collect()
    }


class TestRollmedStream:
    def test_three_wave_replay_equals_batch(self, spark, tmp_path, waves):
        d, paths = waves
        incoming = tmp_path / "incoming"
        incoming.mkdir()
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        wave1_rows = None
        for i, p in enumerate(paths):
            shutil.copy(p, incoming / f"wave{i}.jsonl")
            q = run_rollmed_stream(
                spark, str(incoming), str(out), str(ckpt)
            ).start()
            q.awaitTermination()
            if i == 0:
                wave1_rows = _rows(spark.read.parquet(str(out)))
        got = _rows(spark.read.parquet(str(out)))
        batch = _rows(
            r44_rolling_median(spark, SF_SMALL).select(
                "event_id", "user_id", "med7"
            )
        )
        assert got == batch
        # wave-1 emissions were final: still present, unrevised
        assert wave1_rows <= got
        assert wave1_rows == {r for r in batch if r in wave1_rows}
