"""Batch≡stream equality for the COMPOSED curation pipeline
(streaming/curation.py vs q75): the sf0.001 documents replayed in
doc_id order across 3 waves, each wave a separate run restarting from
the checkpoint; the accepted store must equal q75's batch output
exactly, and wave-1 acceptances must be final."""

from __future__ import annotations

import json

import pytest

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.curation import (
    q75_curation_pipeline,
)
from batch_processing_system_spark.streaming.curation import (
    run_curation_stream,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def doc_waves(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("curwaves")
    rows = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang", "text")
        .orderBy("doc_id")
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
                    {"doc_id": r["doc_id"], "lang": r["lang"], "text": r["text"]}
                )
                for r in rows[bounds[i] : bounds[i + 1]]
            )
            + "\n"
        )
        paths.append(str(p))
    return paths


def _rows(df):
    return {
        (r["doc_id"], r["lang"], r["n_tokens"], r["split"])
        for r in df.collect()
    }


class TestCurationStream:
    def test_three_wave_replay_equals_q75(self, spark, tmp_path, doc_waves):
        import shutil

        incoming = tmp_path / "incoming"
        incoming.mkdir()
        state = tmp_path / "state"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        wave1 = None
        for i, p in enumerate(doc_waves):
            shutil.copy(p, incoming / f"wave{i}.jsonl")
            q = run_curation_stream(
                spark, str(incoming), str(state), str(out), str(ckpt)
            ).start()
            q.awaitTermination()
            if i == 0:
                wave1 = _rows(spark.read.parquet(str(out)))
        got = _rows(spark.read.parquet(str(out)))
        batch = _rows(q75_curation_pipeline(spark, SF_SMALL))
        assert got == batch
        # acceptance is final: wave-1 rows all survive into the end state
        assert wave1 <= got

    def test_replay_same_batch_is_idempotent(self, spark, tmp_path, doc_waves):
        """foreachBatch is at-least-once: after a batch commits its
        stores, a replay of the SAME batch id must reproduce the same
        acceptances (not reject everything as dups against its own
        partial state) and must not grow the stores."""
        import shutil

        from batch_processing_system_spark.streaming.curation import (
            INCOMING_CURATION_SCHEMA,
            curation_batch,
        )

        incoming = tmp_path / "incoming"
        incoming.mkdir()
        state = tmp_path / "state"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        shutil.copy(doc_waves[0], incoming / "wave0.jsonl")
        q = run_curation_stream(
            spark, str(incoming), str(state), str(out), str(ckpt)
        ).start()
        q.awaitTermination()
        first = _rows(spark.read.parquet(str(out)))
        docs_n = spark.read.parquet(str(state / "docs")).count()
        bands_n = spark.read.parquet(str(state / "bands")).count()
        batch = spark.read.schema(INCOMING_CURATION_SCHEMA).json(
            str(incoming / "wave0.jsonl")
        )
        replay = curation_batch(spark, batch, str(state), batch_id=0)
        got = {
            (r["doc_id"], r["lang"], r["n_tokens"], r["split"])
            for r in replay.collect()
        }
        assert got == first
        assert spark.read.parquet(str(state / "docs")).count() == docs_n
        assert spark.read.parquet(str(state / "bands")).count() == bands_n
