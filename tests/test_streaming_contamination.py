"""Continuous contamination screening: document files arrive in waves;
docs sharing an 8-gram with the held-out benchmark are quarantined,
clean docs reach the corpus, and a checkpointed restart re-screens
nothing — the streaming twin of q78's batch audit."""

from __future__ import annotations

import json

from batch_processing_system_spark.streaming.contamination import (
    stream_screen_documents,
)

LEAK = "alpha bravo charlie delta echo foxtrot golf hotel india"


def doc_line(doc_id, text):
    return json.dumps({"doc_id": doc_id, "text": text})


class TestStreamingContamination:
    def _eval_docs(self, spark):
        return spark.createDataFrame(
            [(1000, f"benchmark question says {LEAK} end")],
            "doc_id bigint, text string",
        )

    def _run(self, spark, incoming, tmp_path):
        q = (
            stream_screen_documents(
                spark,
                str(incoming),
                str(tmp_path / "clean"),
                str(tmp_path / "flagged"),
                self._eval_docs(spark),
                str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_routing_and_restart(self, spark, tmp_path):
        incoming = tmp_path / "incoming"
        incoming.mkdir()

        (incoming / "w1.jsonl").write_text(
            "\n".join(
                [
                    doc_line(1, f"a train doc quoting {LEAK} verbatim"),
                    doc_line(2, "one two three four five six seven eight nine ten"),
                ]
            )
            + "\n"
        )
        self._run(spark, incoming, tmp_path)
        clean = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
        flagged = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "flagged")).collect()
        }
        assert clean == {2} and flagged == {1}

        # wave 2 restarts from the checkpoint: wave-1 files must not be
        # re-screened (no duplicate rows), new docs route correctly
        (incoming / "w2.jsonl").write_text(
            "\n".join(
                [
                    doc_line(3, f"another contaminated doc with {LEAK} inside"),
                    doc_line(4, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
                ]
            )
            + "\n"
        )
        self._run(spark, incoming, tmp_path)
        clean_rows = spark.read.parquet(str(tmp_path / "clean")).collect()
        flagged_rows = spark.read.parquet(str(tmp_path / "flagged")).collect()
        assert sorted(r["doc_id"] for r in clean_rows) == [2, 4]
        assert sorted(r["doc_id"] for r in flagged_rows) == [1, 3]

    def test_short_docs_never_flag(self, spark, tmp_path):
        # docs with < 8 words have no 8-grams: always clean
        incoming = tmp_path / "incoming"
        incoming.mkdir()
        (incoming / "w.jsonl").write_text(doc_line(7, "alpha bravo charlie") + "\n")
        self._run(spark, incoming, tmp_path)
        clean = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
        assert clean == {7}
