"""HTTP batch-API client for the remote seam — the wire-format
implementation of the four-method boundary the pipeline is built
around (/root/reference/README.md:74-77,83-92: upload the JSONL,
create the batch, poll status, fetch result files).

Speaks the publicly documented Files/Batches REST shape:

    POST {base}/files                multipart/form-data
                                     (purpose=batch, file=<jsonl>)
                                     -> {"id": "file-..."}
    POST {base}/batches              JSON {input_file_id, endpoint,
                                     completion_window}
                                     -> {"id": "batch_..."}
    GET  {base}/batches/{id}         -> {"status": ...,
                                     "output_file_id": ...,
                                     "error_file_id": ...}
    GET  {base}/files/{id}/content   -> raw JSONL bytes

stdlib urllib only — no HTTP library exists in this container, and
none is needed for four endpoints. Retries/backoff stay with the
caller (`run.with_retry` wraps every remote call, per the spec's
"rely on the next scheduled run" posture), so this class is a thin,
stateless wire adapter: swap it for `DirectoryRemote` and nothing
else in the pipeline changes — that interchangeability IS the seam
contract, and tests drive the full submit→poll→completed lifecycle
through both.

``result_files`` downloads to local paths because the processing
dataflow (process.load_outcomes) reads JSONL from a path; at cluster
scale the download lands on shared storage and executors read it in
parallel — the driver only moves the handle, the data volume is the
result file itself either way.
"""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request
import uuid


class HttpBatchRemote:
    def __init__(self, base_url: str, api_key: str = "", timeout: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    # --- wire plumbing -------------------------------------------------

    def _headers(self, extra: dict | None = None) -> dict:
        h = {}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        if extra:
            h.update(extra)
        return h

    def _request(self, method: str, path: str, body: bytes | None = None,
                 headers: dict | None = None) -> bytes:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=body,
            headers=self._headers(headers),
            method=method,
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def _json(self, method: str, path: str, payload: dict | None = None) -> dict:
        body = json.dumps(payload).encode() if payload is not None else None
        headers = {"Content-Type": "application/json"} if body else None
        return json.loads(self._request(method, path, body, headers))

    # --- the four-method seam ------------------------------------------

    def upload(self, path: str) -> str:
        boundary = f"----bps{uuid.uuid4().hex}"
        with open(path, "rb") as f:
            content = f.read()
        name = os.path.basename(path)
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="purpose"\r\n\r\n'
            "batch\r\n"
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="file"; filename="{name}"\r\n'
            "Content-Type: application/jsonl\r\n\r\n"
        ).encode() + content + f"\r\n--{boundary}--\r\n".encode()
        out = json.loads(
            self._request(
                "POST",
                "/files",
                body,
                {"Content-Type": f"multipart/form-data; boundary={boundary}"},
            )
        )
        return out["id"]

    def create_batch(self, input_file_id: str) -> str:
        out = self._json(
            "POST",
            "/batches",
            {
                "input_file_id": input_file_id,
                "endpoint": "/v1/chat/completions",
                "completion_window": "24h",
            },
        )
        return out["id"]

    def retrieve(self, batch_id: str) -> str:
        return self._json("GET", f"/batches/{batch_id}")["status"]

    def download(self, file_id: str) -> str:
        """Fetch a file's content to a local path — the seam's file
        fetch (input-JSONL recovery for failed-job propagation)."""
        data = self._request("GET", f"/files/{file_id}/content")
        fd, local = tempfile.mkstemp(suffix=".jsonl", prefix="download-")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return local

    def result_files(self, batch_id: str):
        b = self._json("GET", f"/batches/{batch_id}")
        paths = []
        for key in ("output_file_id", "error_file_id"):
            fid = b.get(key)
            if not fid:
                paths.append(None)
                continue
            data = self._request("GET", f"/files/{fid}/content")
            fd, local = tempfile.mkstemp(suffix=".jsonl", prefix=f"{key}-")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            paths.append(local)
        return tuple(paths)
