"""Filesystem-backed stand-in for the remote batch boundary.

The reference's remote is the OpenAI Files/Batches HTTP API
(/root/reference/README.md:74-77,83-92); in this sandbox the same
four-method seam (`upload`, `create_batch`, `retrieve`,
`result_files`) is served from a directory, so the CLI and e2e tests
can drive a full submit→poll→completed lifecycle with the remote's
progress scripted by editing small JSON control files:

    <root>/files/<file_id>.jsonl      uploaded inputs
    <root>/batches/<batch_id>.json    {"status": ..., "input_file_id": ...,
                                       "output_file": ..., "error_file": ...}

An operator (or a test) advances a batch by editing its control file —
exactly the observable behavior of the real remote, minus the network.
A real deployment swaps this object for an HTTP client with the same
four methods; nothing else changes.
"""

from __future__ import annotations

import json
import os
import shutil


class DirectoryRemote:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "files"), exist_ok=True)
        os.makedirs(os.path.join(root, "batches"), exist_ok=True)

    _PREFIX = {"files": "file", "batches": "batch"}

    def _alloc(self, kind: str, ext: str) -> tuple[str, int]:
        """Atomically claim the next sequential id: O_CREAT|O_EXCL makes
        the filesystem the arbiter, so two concurrent allocators can
        never claim the same id and overwrite each other's payload —
        the loser of the race just advances to the next number."""
        d = os.path.join(self.root, kind)
        n = len(os.listdir(d)) + 1
        while True:
            ident = f"{self._PREFIX[kind]}-{n:06d}"
            try:
                fd = os.open(
                    os.path.join(d, ident + ext),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                return ident, fd
            except FileExistsError:
                n += 1

    def upload(self, path: str) -> str:
        file_id, fd = self._alloc("files", ".jsonl")
        with open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
            shutil.copyfileobj(src, dst)
        return file_id

    def create_batch(self, input_file_id: str) -> str:
        batch_id, fd = self._alloc("batches", ".json")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "status": "validating",
                    "input_file_id": input_file_id,
                    "output_file": None,
                    "error_file": None,
                },
                f,
            )
        return batch_id

    def retrieve(self, batch_id: str) -> str:
        return self._read_batch(batch_id)["status"]

    def download(self, file_id: str) -> str:
        """Local path of an uploaded file's content — the seam's file
        fetch (used to recover a failed job's custom_ids from its
        input JSONL)."""
        path = os.path.join(self.root, "files", f"{file_id}.jsonl")
        if not os.path.exists(path):
            raise FileNotFoundError(file_id)
        return path

    def result_files(self, batch_id: str):
        b = self._read_batch(batch_id)
        return b.get("output_file"), b.get("error_file")

    # --- control-file plumbing (also used by tests to script progress) ---

    def _batch_path(self, batch_id: str) -> str:
        return os.path.join(self.root, "batches", f"{batch_id}.json")

    def _read_batch(self, batch_id: str) -> dict:
        with open(self._batch_path(batch_id)) as f:
            return json.load(f)

    def _write_batch(self, batch_id: str, payload: dict) -> None:
        with open(self._batch_path(batch_id), "w") as f:
            json.dump(payload, f)

    def set_status(
        self,
        batch_id: str,
        status: str,
        output_file: str | None = None,
        error_file: str | None = None,
    ) -> None:
        b = self._read_batch(batch_id)
        b["status"] = status
        if output_file is not None:
            b["output_file"] = output_file
        if error_file is not None:
            b["error_file"] = error_file
        self._write_batch(batch_id, b)
