"""HttpBatchRemote against an in-process stub batch API server that
ASSERTS the wire format (auth header, multipart upload shape, JSON
bodies) — then the full submit→poll→completed pipeline lifecycle over
real HTTP, proving the remote seam is interchangeable between the
directory fake and the wire client with zero pipeline changes."""

from __future__ import annotations

import json
import threading
from datetime import datetime
from email.parser import BytesParser
from email.policy import default as _default_policy
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from batch_processing_system_spark.pipeline.httpremote import HttpBatchRemote

T0 = datetime(2026, 1, 1, 12, 0, 0)
API_KEY = "test-key-123"


class StubBatchAPI(BaseHTTPRequestHandler):
    """Minimal Files/Batches API: validates the wire format hard —
    a malformed request is a 400, not a silent accept."""

    files: dict[str, bytes] = {}
    batches: dict[str, dict] = {}
    seen_requests: list[tuple[str, str]] = []

    def log_message(self, fmt, *args):
        pass

    def _reply(self, code, payload, raw=None):
        data = raw if raw is not None else json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _auth_ok(self) -> bool:
        return self.headers.get("Authorization") == f"Bearer {API_KEY}"

    def do_POST(self):
        type(self).seen_requests.append(("POST", self.path))
        if not self._auth_ok():
            return self._reply(401, {"error": "bad auth"})
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if self.path == "/files":
            ctype = self.headers.get("Content-Type", "")
            if "multipart/form-data" not in ctype:
                return self._reply(400, {"error": "expected multipart"})
            msg = BytesParser(policy=_default_policy).parsebytes(
                b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body
            )
            fields = {
                p.get_param("name", header="content-disposition"): p
                for p in msg.iter_parts()
            }
            if fields.get("purpose") is None or fields.get("file") is None:
                return self._reply(400, {"error": "missing purpose/file"})
            if fields["purpose"].get_payload(decode=True) != b"batch":
                return self._reply(400, {"error": "purpose must be batch"})
            fid = f"file-{len(type(self).files) + 1:04d}"
            type(self).files[fid] = fields["file"].get_payload(decode=True)
            return self._reply(200, {"id": fid, "purpose": "batch"})
        if self.path == "/batches":
            payload = json.loads(body)
            for req_key in ("input_file_id", "endpoint", "completion_window"):
                if req_key not in payload:
                    return self._reply(400, {"error": f"missing {req_key}"})
            if payload["input_file_id"] not in type(self).files:
                return self._reply(404, {"error": "no such file"})
            bid = f"batch_{len(type(self).batches) + 1:04d}"
            type(self).batches[bid] = {
                "id": bid,
                "status": "validating",
                "input_file_id": payload["input_file_id"],
                "output_file_id": None,
                "error_file_id": None,
            }
            return self._reply(200, type(self).batches[bid])
        return self._reply(404, {"error": "not found"})

    def do_GET(self):
        type(self).seen_requests.append(("GET", self.path))
        if not self._auth_ok():
            return self._reply(401, {"error": "bad auth"})
        if self.path.startswith("/batches/"):
            bid = self.path.rsplit("/", 1)[1]
            if bid not in type(self).batches:
                return self._reply(404, {"error": "no such batch"})
            return self._reply(200, type(self).batches[bid])
        if self.path.startswith("/files/") and self.path.endswith("/content"):
            fid = self.path.split("/")[2]
            if fid not in type(self).files:
                return self._reply(404, {"error": "no such file"})
            return self._reply(200, None, raw=type(self).files[fid])
        return self._reply(404, {"error": "not found"})


@pytest.fixture()
def stub_api():
    StubBatchAPI.files = {}
    StubBatchAPI.batches = {}
    StubBatchAPI.seen_requests = []
    srv = HTTPServer(("127.0.0.1", 0), StubBatchAPI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestWireFormat:
    def test_upload_create_retrieve_roundtrip(self, stub_api, tmp_path):
        remote = HttpBatchRemote(stub_api, api_key=API_KEY)
        src = tmp_path / "req.jsonl"
        src.write_text('{"custom_id": "doc-1"}\n')
        fid = remote.upload(str(src))
        assert StubBatchAPI.files[fid] == b'{"custom_id": "doc-1"}\n'
        bid = remote.create_batch(fid)
        assert remote.retrieve(bid) == "validating"

    def test_bad_api_key_is_an_error(self, stub_api, tmp_path):
        remote = HttpBatchRemote(stub_api, api_key="wrong")
        src = tmp_path / "req.jsonl"
        src.write_text("{}\n")
        with pytest.raises(Exception):
            remote.upload(str(src))

    def test_result_files_downloads_content(self, stub_api, tmp_path):
        remote = HttpBatchRemote(stub_api, api_key=API_KEY)
        src = tmp_path / "req.jsonl"
        src.write_text("{}\n")
        fid = remote.upload(str(src))
        bid = remote.create_batch(fid)
        StubBatchAPI.files["file-out"] = b'{"custom_id": "doc-1", "ok": true}\n'
        StubBatchAPI.batches[bid].update(
            status="completed", output_file_id="file-out"
        )
        out_path, err_path = remote.result_files(bid)
        assert err_path is None
        assert open(out_path, "rb").read() == b'{"custom_id": "doc-1", "ok": true}\n'


class TestPipelineOverHttp:
    def test_full_lifecycle_submit_poll_completed(self, spark, stub_api, tmp_path):
        """The exact lifecycle test the DirectoryRemote runs, over the
        wire: submit_batch uploads + creates via HTTP, run_poll_cycle
        polls and downloads results via HTTP, docs get their
        event_response — no pipeline code changed for the swap."""
        from batch_processing_system_spark.pipeline.run import (
            run_poll_cycle,
            submit_batch,
        )
        from batch_processing_system_spark.pipeline.schemas import DOCUMENT_SCHEMA
        from tests.test_pipeline import SCHEMA_JSON, _write_jsonl, good_request, result_line

        docs = spark.createDataFrame(
            [(f"doc-{i:03d}", "pending", [], "{}") for i in range(3)],
            DOCUMENT_SCHEMA,
        )
        remote = HttpBatchRemote(stub_api, api_key=API_KEY)
        req = _write_jsonl(tmp_path, "req.jsonl", [good_request(0)])
        out = submit_batch(spark, req, SCHEMA_JSON, docs, remote, "job-1", T0)
        assert out.errors == [] and out.job_id == "job-1"

        # remote completes the batch with a result file
        ok = json.dumps({"sentiment": "positive", "score": 0.9})
        StubBatchAPI.files["file-res"] = (
            json.dumps(result_line(0, content=ok)) + "\n"
        ).encode()
        bid = out.jobs.collect()[0]["openai_batch_id"]
        StubBatchAPI.batches[bid].update(
            status="completed", output_file_id="file-res"
        )

        jobs2, docs2 = run_poll_cycle(spark, out.jobs, out.marked_docs, remote, T0)
        job = jobs2.collect()[0]
        assert job["status"] == "completed"
        state = {r["_id"]: r for r in docs2.collect()}
        assert state["doc-000"]["ai_status"] == "completed"
        assert len(state["doc-000"]["event_response"]) == 1
        # and the wire saw the documented endpoints
        paths = [p for _, p in StubBatchAPI.seen_requests]
        assert "/files" in paths and "/batches" in paths
        assert any(p.startswith("/batches/batch_") for p in paths)
        assert any(p.endswith("/content") for p in paths)
