"""End-to-end CLI test: drive submit → poll → completed through real
subprocesses (`python -m batch_processing_system_spark.pipeline`)
against the DirectoryRemote, asserting the spec's 202/400 bodies and
the final document state (the deployable surface the reference exposes
as POST /process-batch + the scheduled poller)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from batch_processing_system_spark.pipeline.localremote import DirectoryRemote
from batch_processing_system_spark.pipeline.schemas import DOCUMENT_SCHEMA

from .test_pipeline import SCHEMA_JSON, good_request, result_line

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv: str):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "batch_processing_system_spark.pipeline", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    body = json.loads(lines[-1]) if lines else None
    return proc.returncode, body, proc.stderr


@pytest.fixture()
def state(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    rows = [(f"doc-{i:03d}", "pending", [], "{}") for i in range(3)]
    spark.createDataFrame(rows, DOCUMENT_SCHEMA).write.parquet(docs_path)
    req = tmp_path / "req.jsonl"
    req.write_text(
        "\n".join(json.dumps(good_request(i)) for i in range(2)) + "\n"
    )
    return {
        "docs": docs_path,
        "jobs": str(tmp_path / "jobs"),
        "remote": str(tmp_path / "remote"),
        "req": str(req),
        "tmp": tmp_path,
    }


class TestCliLifecycle:
    def test_submit_poll_complete(self, spark, state):
        rc, body, err = run_cli(
            "submit",
            "--jsonl", state["req"],
            "--schema-json", SCHEMA_JSON,
            "--docs", state["docs"],
            "--jobs", state["jobs"],
            "--remote", state["remote"],
            "--job-id", "job-e2e",
            "--now", "2024-01-01T12:00:00",
        )
        assert rc == 0, err[-2000:]
        assert body == {"job_id": "job-e2e"}  # the spec's 202 body

        # remote still in a transient state → job stays active
        rc, body, err = run_cli(
            "poll", "--docs", state["docs"], "--jobs", state["jobs"],
            "--remote", state["remote"], "--now", "2024-01-01T12:05:00",
        )
        assert rc == 0, err[-2000:]
        assert body["active_after"] == 1

        # script the remote to completed with result files
        ok = json.dumps({"sentiment": "positive", "score": 0.9})
        out_path = state["tmp"] / "out.jsonl"
        out_path.write_text(
            json.dumps(result_line(0, content=ok)) + "\n"
            + json.dumps(result_line(1, error="boom")) + "\n"
        )
        DirectoryRemote(state["remote"]).set_status(
            "batch-000001", "completed", output_file=str(out_path)
        )

        rc, body, err = run_cli(
            "poll", "--docs", state["docs"], "--jobs", state["jobs"],
            "--remote", state["remote"], "--now", "2024-01-01T12:10:00",
        )
        assert rc == 0, err[-2000:]
        assert body["active_after"] == 0
        assert body["status_counts"] == {"completed": 1}

        docs = {r["_id"]: r for r in spark.read.parquet(state["docs"]).collect()}
        assert docs["doc-000"]["ai_status"] == "completed"
        [item] = docs["doc-000"]["event_response"]
        assert json.loads(item["event_response"])["sentiment"] == "positive"
        assert docs["doc-001"]["ai_status"] == "failed"
        assert docs["doc-002"]["ai_status"] == "pending"  # untargeted

        jobs = spark.read.parquet(state["jobs"]).collect()
        assert jobs[0]["status"] == "completed"
        assert jobs[0]["output_file_id"] == str(out_path)

    def test_submit_validation_failure_prints_400_body(self, state):
        bad = state["tmp"] / "bad.jsonl"
        bad.write_text(
            json.dumps(good_request(0)) + "\n"
            + json.dumps(good_request(1, model="other-model")) + "\n"
        )
        rc, body, err = run_cli(
            "submit",
            "--jsonl", str(bad),
            "--schema-json", SCHEMA_JSON,
            "--docs", state["docs"],
            "--jobs", state["jobs"],
            "--remote", state["remote"],
        )
        assert rc == 2, err[-2000:]
        assert body["error"] == "Validation Failed"
        assert body["details"][0]["type"] == "model_mismatch"
        assert body["details"][0]["line"] == 2
        # rejected submissions leave no state behind
        assert not os.path.exists(state["jobs"])


class TestCliHttpRemote:
    def test_submit_poll_complete_over_http(self, spark, state):
        """The same lifecycle through --remote-url: CLI subprocesses
        talk to an in-test stub batch API over localhost — the
        deployable wire path end-to-end."""
        import threading
        from http.server import HTTPServer

        from .test_httpremote import API_KEY, StubBatchAPI

        StubBatchAPI.files = {}
        StubBatchAPI.batches = {}
        StubBatchAPI.seen_requests = []
        srv = HTTPServer(("127.0.0.1", 0), StubBatchAPI)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            env_extra = {"BATCH_API_KEY": API_KEY}
            import os as _os
            import subprocess as _sp
            import sys as _sys

            def run(*argv):
                env = dict(_os.environ, PYTHONPATH=REPO, **env_extra)
                proc = _sp.run(
                    [_sys.executable, "-m", "batch_processing_system_spark.pipeline", *argv],
                    capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
                )
                lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
                return proc.returncode, (json.loads(lines[-1]) if lines else None), proc.stderr

            rc, body, err = run(
                "submit", "--jsonl", state["req"], "--schema-json", SCHEMA_JSON,
                "--docs", state["docs"], "--jobs", state["jobs"],
                "--remote-url", url, "--job-id", "job-http",
                "--now", "2024-01-01T12:00:00",
            )
            assert rc == 0, err[-2000:]
            assert body == {"job_id": "job-http"}
            assert len(StubBatchAPI.files) == 1  # upload hit the wire

            # complete the batch remotely with a result file
            ok = json.dumps({"sentiment": "positive", "score": 0.9})
            StubBatchAPI.files["file-res"] = (
                "\n".join(
                    json.dumps(result_line(i, content=ok)) for i in range(2)
                ) + "\n"
            ).encode()
            bid = next(iter(StubBatchAPI.batches))
            StubBatchAPI.batches[bid].update(
                status="completed", output_file_id="file-res"
            )

            rc, body, err = run(
                "poll", "--docs", state["docs"], "--jobs", state["jobs"],
                "--remote-url", url, "--now", "2024-01-01T12:05:00",
            )
            assert rc == 0, err[-2000:]
            assert body["active_after"] == 0
            assert body["status_counts"] == {"completed": 1}
            docs = {r["_id"]: r for r in spark.read.parquet(state["docs"]).collect()}
            assert docs["doc-000"]["ai_status"] == "completed"
            assert len(docs["doc-000"]["event_response"]) == 1
        finally:
            srv.shutdown()
