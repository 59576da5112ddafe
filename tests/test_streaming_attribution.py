"""Batch≡stream equality for the attribution twin
(streaming/attribution.py vs r06): time-ordered 3-wave replay with
checkpoint restarts; the append-only attribution log must equal the
batch answer exactly, and rows emitted in wave 1 must already be
final."""

from __future__ import annotations

import json

import pytest

from batch_processing_system_spark.engine.det import epoch_us
from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.wrangling import r06_attribution
from batch_processing_system_spark.streaming.attribution import (
    run_attribution_stream,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def waves_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("attrwaves")
    rows = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "event_id", "event_type", epoch_us("ts").alias("eu"))
        .orderBy("eu", "event_id")
        .collect()
    )
    n = len(rows)
    bounds = [0, n // 3, 2 * n // 3, n]
    waves = []
    for i in range(3):
        path = d / f"wave{i}.jsonl"
        path.write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": r["user_id"],
                        "event_id": r["event_id"],
                        "event_type": r["event_type"],
                        "eu": r["eu"],
                    }
                )
                for r in rows[bounds[i] : bounds[i + 1]]
            )
            + "\n"
        )
        waves.append(str(path))
    return d, waves


def _replay(spark, waves, incoming, out, ckpt):
    import shutil

    for w in waves:
        shutil.copy(w, incoming)
        q = run_attribution_stream(spark, str(incoming), str(out), str(ckpt)).start()
        q.awaitTermination(120)


def _attr_set(rows):
    return {
        (r["purchase_id"], r["user_id"], r["touch_id"], r["touch_type"], r["gap_us"])
        for r in rows
    }


class TestAttributionStream:
    def test_matches_batch_r06(self, spark, tmp_path, waves_dir):
        _, waves = waves_dir
        incoming = tmp_path / "in"
        incoming.mkdir()
        out = tmp_path / "attr"
        _replay(spark, waves, incoming, out, tmp_path / "ckpt")
        got = _attr_set(spark.read.parquet(str(out)).collect())
        want = _attr_set(r06_attribution(spark, SF_SMALL).collect())
        assert got == want

    def test_wave1_rows_are_final(self, spark, tmp_path, waves_dir):
        """Attribution is append-only: everything emitted after wave 1
        must appear verbatim in the final batch answer (earlier
        arrivals can never be revised by later events)."""
        _, waves = waves_dir
        incoming = tmp_path / "in"
        incoming.mkdir()
        out = tmp_path / "attr"
        _replay(spark, waves[:1], incoming, out, tmp_path / "ckpt")
        partial = _attr_set(spark.read.parquet(str(out)).collect())
        assert partial
        want = _attr_set(r06_attribution(spark, SF_SMALL).collect())
        assert partial <= want
