"""Continuous PII scrubbing: documents stream in as JSONL files and
land in the corpus with emails/phones already replaced by typed
placeholders — the streaming twin of q90, stateless so the scrub
fuses into the ingest scan; a checkpointed restart re-scrubs nothing."""

from __future__ import annotations

import json

from batch_processing_system_spark.streaming.scrub import (
    stream_scrub_documents,
)


def doc_line(doc_id, text):
    return json.dumps({"doc_id": doc_id, "text": text})


class TestStreamingScrub:
    def _run(self, spark, incoming, tmp_path):
        q = (
            stream_scrub_documents(
                spark,
                str(incoming),
                str(tmp_path / "corpus"),
                str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_scrub_at_ingest_and_restart(self, spark, tmp_path):
        incoming = tmp_path / "incoming"
        incoming.mkdir()
        (incoming / "w1.jsonl").write_text(
            "\n".join(
                [
                    doc_line(1, "mail bob@corp.io or dial 555-123-4567 ok"),
                    doc_line(2, "nothing sensitive in here"),
                ]
            )
            + "\n"
        )
        self._run(spark, incoming, tmp_path)
        rows = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
        assert rows[1]["text"] == "mail <EMAIL> or dial <PHONE> ok"
        assert (rows[1]["n_emails"], rows[1]["n_phones"]) == (1, 1)
        assert rows[2]["text"] == "nothing sensitive in here"
        assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (0, 0)
        # raw PII never persisted anywhere in the corpus dir
        all_text = " ".join(r["text"] for r in rows.values())
        assert "bob@corp.io" not in all_text and "555-123-4567" not in all_text

        # wave 2 + restart from the same checkpoint: wave-1 files are
        # not re-processed (no duplicate doc 1), wave-2 docs arrive
        (incoming / "w2.jsonl").write_text(
            doc_line(3, "second wave x@y.dev here") + "\n"
        )
        self._run(spark, incoming, tmp_path)
        rows2 = [r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()]
        assert sorted(rows2) == [1, 2, 3]
        got3 = [
            r["text"]
            for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
            if r["doc_id"] == 3
        ]
        assert got3 == ["second wave <EMAIL> here"]
