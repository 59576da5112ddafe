"""Pipeline orchestration (/root/reference/README.md:71-110; SURVEY
§3.1-3.3): submission, the periodic poll cycle, and result processing,
wired together around an injectable remote client.

The reference's external boundaries (OpenAI HTTP, MongoDB) are
abstracted as:
- ``remote``: an object with ``upload(path)->file_id``,
  ``create_batch(file_id)->batch_id``, ``retrieve(batch_id)->status``,
  ``download(file_id)->path`` — tests inject a deterministic fake.
- ``store``: load/save DataFrames for the jobs table and target
  collection (parquet snapshots here; any connector at deployment).

T1 (the 5-minute scheduler, :81,145) is ``run_poll_cycle`` invoked by
whatever cadence the deployment chooses; T3 (retry w/ exponential
backoff, :84,146,161) wraps every remote call.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .process import process_results
from .schemas import status_field, status_values
from .state import active_jobs, apply_poll_results, new_job_row
from .validate import validate_submission

logger = logging.getLogger("batch_processing_system_spark.pipeline")


def _json_log(level: str, event: str, message: str, **context: Any) -> None:
    """S7: structured JSON log events with the spec's mandatory fields
    (/root/reference/README.md:150-156)."""
    rec = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "level": level,
        "event": event,
        "message": message,
        **{k: v for k, v in context.items() if v is not None},
    }
    logger.log(getattr(logging, level, logging.INFO), json.dumps(rec))


def with_retry(
    fn: Callable[[], Any],
    max_attempts: int = 3,
    base_delay: float = 1.0,
    sleep: Callable[[float], None] | None = None,
) -> Any:
    """T3: ≤3 attempts with exponential backoff 2^n
    (/root/reference/README.md:84,146,161). On persistent failure the
    exception propagates — the caller logs and skips, and the next
    scheduled cycle retries (:84 'relying on the next scheduled run')."""
    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — boundary retry wrapper
            last = exc
            if attempt < max_attempts - 1:
                delay = base_delay * (2**attempt)
                _json_log(
                    "WARN", "retry", f"attempt {attempt + 1} failed: {exc}; retrying in {delay}s"
                )
                # resolved at CALL time, not captured as a default at
                # import time (ADVICE r9): tests that monkeypatch
                # run.time.sleep must actually suppress the backoff
                (sleep if sleep is not None else time.sleep)(delay)
    raise last  # type: ignore[misc]


#: Driver-side bound on the 400 body (VERDICT r12 item 3): the spec
#: returns the batch's validation errors (/root/reference/README.md:
#: 37-53), but an adversarial multi-GB malformed JSONL must not
#: materialize every line's error on the driver. The body carries the
#: FIRST N errors in deterministic (line, type) order plus the TRUE
#: total, which keeps the contract's spirit ("the caller learns what
#: is wrong and how much of it there is") with O(N) driver memory.
ERROR_CAP = 1000


@dataclass
class SubmissionOutcome:
    job_id: str | None
    jobs: DataFrame | None  # state rows to append (None on 400)
    errors: list[dict]  # first ERROR_CAP validation errors (400 body)
    marked_docs: DataFrame | None  # docs snapshot with in_progress marks
    # true error count, >= len(errors); len(errors) < total_errors
    # means the body was capped (the API layer surfaces both)
    total_errors: int = 0


def submit_batch(
    spark: SparkSession,
    jsonl_path: str,
    output_schema_json: str,
    docs: DataFrame,
    remote,
    job_id: str,
    now,
    collection_name: str = "documents",
    mongodb_uri: str = "store://test",
) -> SubmissionOutcome:
    """§3.1: validate → upload → create batch → persist job row →
    mark targeted docs in_progress → 202/400."""
    result = validate_submission(spark, jsonl_path, output_schema_json, docs)
    # bounded-collect: limit(ERROR_CAP) caps the driver materialization
    # regardless of how many lines of the upload are malformed
    # (VERDICT r12 item 3); (line, type) order makes the retained
    # prefix deterministic. The true total is recounted only when the
    # head actually hit the cap — the common small-error case costs a
    # single pass.
    capped = result.errors.orderBy(
        F.col("line").asc_nulls_first(), "type"
    ).limit(ERROR_CAP)
    # bounded-collect: at most ERROR_CAP rows by the limit above
    errors = [r.asDict() for r in capped.collect()]
    if errors:
        total = (
            result.errors.count() if len(errors) == ERROR_CAP else len(errors)
        )
        _json_log(
            "ERROR",
            "submission_rejected",
            f"validation failed ({total} error(s), first {len(errors)} returned)",
            job_id=job_id,
        )
        return SubmissionOutcome(None, None, errors, None, total_errors=total)

    input_file_id = with_retry(lambda: remote.upload(jsonl_path))
    batch_id = with_retry(lambda: remote.create_batch(input_file_id))
    jobs = new_job_row(
        spark,
        job_id,
        batch_id,
        input_file_id,
        output_schema_json,
        mongodb_uri,
        collection_name,
        result.model or "",
        now,
    )

    # §3.1 step 6 — $set ai_status='in_progress' on each targeted doc
    # (/root/reference/README.md:77), as a semi-join-driven rebuild.
    targeted = result.valid_requests.select(F.col("custom_id").alias("t_id")).distinct()
    sfield = status_field()
    s_in_progress, _, _ = status_values()
    marked = (
        docs.join(targeted, docs["_id"] == F.col("t_id"), "left")
        .withColumn(
            sfield,
            F.when(F.col("t_id").isNotNull(), F.lit(s_in_progress)).otherwise(
                F.col(sfield)
            ),
        )
        .drop("t_id")
    )
    _json_log("INFO", "submission_accepted", "batch submitted", job_id=job_id,
              openai_batch_id=batch_id)
    return SubmissionOutcome(job_id, jobs, [], marked)


def run_poll_cycle(
    spark: SparkSession,
    jobs: DataFrame,
    docs: DataFrame,
    remote,
    now,
) -> tuple[DataFrame, DataFrame]:
    """§3.2 + §3.3: one T1 tick. Polls every active job (F3 selection),
    applies F4 transitions, and for remotely-completed jobs runs result
    processing + upsert. Returns (new_jobs, new_docs).

    The per-job remote fetch is a driver-side boundary exactly as in the
    reference (:83) — job counts are thousands, not billions; the DATA
    parallelism lives inside process_results.
    """
    # bounded-collect: active JOB rows, not data rows — the spec's
    # driver-side poll boundary (:83); job counts are thousands, and
    # each row is a handful of id/status strings
    act = [r.asDict() for r in active_jobs(jobs).collect()]
    polled_rows: list[tuple[str, str]] = []
    for job in act:
        try:
            status = with_retry(lambda j=job: remote.retrieve(j["openai_batch_id"]))
        except Exception as exc:  # persistent failure: log, skip (:84)
            _json_log("ERROR", "poll_failed", str(exc), job_id=job["_id"],
                      openai_batch_id=job["openai_batch_id"])
            continue
        polled_rows.append((job["_id"], status))

    if polled_rows:
        polled = spark.createDataFrame(polled_rows, "_id string, openai_status string")
        jobs = apply_poll_results(jobs, polled, now)

    # §5.2 failed/expired: the job row is already 'failed' via F4;
    # the spec's recommended propagation also marks the job's OWN
    # in_progress target docs failed so they don't dangle forever.
    # The job's custom_ids are recovered from its input JSONL
    # (input_file_id is persisted at submit), and the in_progress
    # gate scopes the flip to docs this job actually holds.
    for job_id, status in polled_rows:
        if status not in ("failed", "expired"):
            continue
        job = next(j for j in act if j["_id"] == job_id)
        try:
            in_path = with_retry(lambda j=job: remote.download(j["input_file_id"]))
        except Exception as exc:  # keep the cycle alive (:84)
            _json_log("ERROR", "failed_job_doc_propagation_failed", str(exc),
                      job_id=job_id)
            continue
        targeted = (
            spark.read.text(in_path)
            .select(F.get_json_object("value", "$.custom_id").alias("t_id"))
            .filter(F.col("t_id").isNotNull())
            .distinct()
        )
        sfield = status_field()
        s_in_progress, _, s_failed = status_values()
        docs = (
            docs.join(F.broadcast(targeted), docs["_id"] == F.col("t_id"), "left")
            .withColumn(
                sfield,
                F.when(
                    F.col("t_id").isNotNull()
                    & (F.col(sfield) == s_in_progress),
                    F.lit(s_failed),
                ).otherwise(F.col(sfield)),
            )
            .drop("t_id")
        )
        _json_log("WARN", "job_failed_docs_marked", "remote batch "
                  f"{status}; targeted docs marked failed", job_id=job_id,
                  openai_batch_id=job["openai_batch_id"])

    # §3.3 for each job whose remote status just became 'completed'.
    for job_id, status in polled_rows:
        if status != "completed":
            continue
        job = next(j for j in act if j["_id"] == job_id)
        # Idempotency guard: a non-null output_file_id means a previous
        # cycle already fetched and processed this job's results —
        # re-entering (e.g. after a crash between persisting the jobs
        # table and the docs table) must not double-$push responses.
        # The status flip below still runs so the row reaches 'completed'.
        if job.get("output_file_id"):
            out_path, err_path = job["output_file_id"], job["error_file_id"]
            _json_log("INFO", "job_already_processed", "skipping re-process",
                      job_id=job_id)
        else:
            out_path, err_path = remote.result_files(job["openai_batch_id"])
            docs, _ = process_results(
                spark, docs, out_path, err_path, job["output_schema_json"], now
            )
            if err_path:
                # spec: "Log any content retrieved from the
                # error_file_id (WARN)" — surfaced as a count, the
                # lines themselves already became 'failed' updates
                n_err = spark.read.text(err_path).count()
                _json_log("WARN", "error_file_content",
                          f"{n_err} error line(s) in {err_path}",
                          job_id=job_id,
                          openai_batch_id=job["openai_batch_id"])
        # Persist the result-file pointers with the status flip (spec
        # schema fills output_file_id/error_file_id on completion) so a
        # crash after this point leaves a resumable, self-describing row.
        this = F.col("_id") == job_id
        jobs = (
            jobs.withColumn(
                "status", F.when(this, F.lit("completed")).otherwise(F.col("status"))
            )
            .withColumn(
                "output_file_id",
                F.when(this, F.lit(out_path)).otherwise(F.col("output_file_id")),
            )
            .withColumn(
                "error_file_id",
                F.when(this, F.lit(err_path)).otherwise(F.col("error_file_id")),
            )
        )
        _json_log("INFO", "job_completed", "results processed", job_id=job_id)
    return jobs, docs
