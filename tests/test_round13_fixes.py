"""Round-13 verdict tasks (VERDICT r12 "Next round"):

- item 2 — sampled + cached hot-key detection: detect_hot_keys grows
  ``sample_fraction`` (the min_share criterion is sampling-stable) and
  detect_hot_keys_cached memoizes the profile per token, so r71's
  steady-state reruns pay zero detection cost; r71 also accepts a
  precomputed hot_keys list directly.
- item 3 — the 400 body is driver-bounded: submit_batch returns the
  first ERROR_CAP validation errors plus the TRUE total instead of
  materializing every malformed line's error on the driver.
"""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine import skew
from batch_processing_system_spark.engine.skew import (
    detect_hot_keys,
    detect_hot_keys_cached,
)

from .conftest import SF_SMALL

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _skewed(spark, n_rows: int, hot_share: float, n_cold: int):
    """floor(hot_share*n_rows) rows on key -1, rest uniform over
    n_cold cold keys (the test_round12_fixes corpus shape)."""
    n_hot = int(n_rows * hot_share)
    return spark.range(n_rows).select(
        F.when(F.col("id") < n_hot, F.lit(-1))
        .otherwise(F.col("id") % n_cold)
        .alias("k"),
        F.col("id").alias("payload"),
    )


class TestSampledDetection:
    """VERDICT r12 item 2: sampling-stable detection — the planted
    0.5/0.3-share keys must be found from a 10% seeded sample."""

    @pytest.mark.parametrize("hot_share", [0.5, 0.3])
    def test_planted_shares_detected_from_sample(self, spark, hot_share):
        df = _skewed(spark, 20_000, hot_share, n_cold=1000)
        hot = detect_hot_keys(
            df, "k", min_share=0.1, sample_fraction=0.1
        )
        assert -1 in hot, (hot_share, hot)
        assert hot[0] == -1  # still heaviest-first under sampling

    def test_sample_is_seeded_deterministic(self, spark):
        df = _skewed(spark, 20_000, 0.3, n_cold=1000)
        a = detect_hot_keys(df, "k", min_share=0.1, sample_fraction=0.1)
        b = detect_hot_keys(df, "k", min_share=0.1, sample_fraction=0.1)
        assert a == b

    def test_uniform_sample_detects_nothing(self, spark):
        df = spark.range(20_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
        )
        assert (
            detect_hot_keys(df, "k", min_share=0.1, sample_fraction=0.1)
            == []
        )

    @pytest.mark.parametrize("bad", [0.0, -0.5, 1.5])
    def test_invalid_fraction_rejected(self, spark, bad):
        df = _skewed(spark, 100, 0.3, n_cold=10)
        with pytest.raises(ValueError, match="sample_fraction"):
            detect_hot_keys(df, "k", sample_fraction=bad)

    def test_full_fraction_equals_unsampled(self, spark):
        df = _skewed(spark, 5_000, 0.3, n_cold=100)
        assert detect_hot_keys(
            df, "k", min_share=0.1, sample_fraction=1.0
        ) == detect_hot_keys(df, "k", min_share=0.1)


class TestCachedDetection:
    def test_profile_computed_once_per_token(self, spark, monkeypatch):
        calls = {"n": 0}
        real = skew.detect_hot_keys

        def counting(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(skew, "detect_hot_keys", counting)
        skew._HOT_KEY_CACHE.clear()
        df = _skewed(spark, 5_000, 0.3, n_cold=100)
        a = detect_hot_keys_cached(("tok1",), df, "k", min_share=0.1)
        b = detect_hot_keys_cached(("tok1",), df, "k", min_share=0.1)
        assert a == b == [-1]
        assert calls["n"] == 1, "second call must be a cache hit"
        detect_hot_keys_cached(("tok2",), df, "k", min_share=0.1)
        assert calls["n"] == 2, "distinct token must recompute"

    def test_cache_returns_a_copy(self, spark):
        skew._HOT_KEY_CACHE.clear()
        df = _skewed(spark, 5_000, 0.3, n_cold=100)
        a = detect_hot_keys_cached(("tok3",), df, "k", min_share=0.1)
        a.append("corrupted")
        assert detect_hot_keys_cached(("tok3",), df, "k", min_share=0.1) == [-1]


class TestR71Precomputed:
    """r71 accepts an externally-known hot list and is row-identical to
    the auto-detected run (salted_broadcast_left equals the plain join
    for ANY hot list — the mitigation is correctness-preserving)."""

    def test_precomputed_equals_autodetected(self, spark):
        from batch_processing_system_spark.queries.aggregates import (
            r71_salted_hot_join,
        )

        auto = {tuple(r) for r in r71_salted_hot_join(spark, SF_SMALL).collect()}
        pre = {
            tuple(r)
            for r in r71_salted_hot_join(spark, SF_SMALL, hot_keys=[7]).collect()
        }
        empty = {
            tuple(r)
            for r in r71_salted_hot_join(spark, SF_SMALL, hot_keys=[]).collect()
        }
        assert auto == pre == empty and auto

    def test_autodetection_is_cached_per_sf_dir(self, spark, monkeypatch):
        from batch_processing_system_spark.queries.aggregates import (
            r71_salted_hot_join,
        )

        calls = {"n": 0}
        real = skew.detect_hot_keys

        def counting(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(skew, "detect_hot_keys", counting)
        skew._HOT_KEY_CACHE.clear()
        r71_salted_hot_join(spark, SF_SMALL).count()
        r71_salted_hot_join(spark, SF_SMALL).count()
        assert calls["n"] == 1, "steady-state rerun must not re-profile"


SCHEMA_JSON = json.dumps(
    {
        "type": "object",
        "properties": {"sentiment": {"type": "string"}},
        "required": ["sentiment"],
    }
)


class _NeverRemote:
    """submit_batch must reject before any remote call on a 400."""

    def upload(self, path):  # pragma: no cover - reaching here is the bug
        raise AssertionError("remote.upload called despite validation errors")

    def create_batch(self, file_id):  # pragma: no cover
        raise AssertionError("remote.create_batch called despite errors")


class TestErrorCap:
    """VERDICT r12 item 3: an over-cap synthetic error stream yields a
    body with exactly ERROR_CAP details and a truthful total."""

    def _submit(self, spark, tmp_path, n_bad: int):
        from batch_processing_system_spark.pipeline.run import submit_batch
        from batch_processing_system_spark.pipeline.schemas import DOCUMENT_SCHEMA

        docs = spark.createDataFrame(
            [("doc-000", "pending", [], "{}")], DOCUMENT_SCHEMA
        )
        p = tmp_path / "bad.jsonl"
        # every line malformed JSON -> one jsonl_format_error per line
        p.write_text("\n".join("{not json" for _ in range(n_bad)) + "\n")
        return submit_batch(
            spark, str(p), SCHEMA_JSON, docs, _NeverRemote(), "job-err", T0
        )

    def test_over_cap_is_truncated_with_true_total(
        self, spark, tmp_path, monkeypatch
    ):
        from batch_processing_system_spark.pipeline import run

        monkeypatch.setattr(run, "ERROR_CAP", 5)
        out = self._submit(spark, tmp_path, n_bad=23)
        assert out.job_id is None
        assert len(out.errors) == 5, "driver materialization must be capped"
        assert out.total_errors == 23, "total must stay truthful"
        # deterministic prefix: the FIRST lines' errors are the ones kept
        assert [e["line"] for e in out.errors] == [1, 2, 3, 4, 5]

    def test_under_cap_unchanged(self, spark, tmp_path):
        out = self._submit(spark, tmp_path, n_bad=3)
        assert len(out.errors) == 3
        assert out.total_errors == 3
        assert {e["type"] for e in out.errors} == {"jsonl_format_error"}

    def test_accepted_submission_has_zero_total(self, spark, tmp_path):
        from batch_processing_system_spark.pipeline.run import submit_batch
        from batch_processing_system_spark.pipeline.schemas import DOCUMENT_SCHEMA

        docs = spark.createDataFrame(
            [("doc-000", "pending", [], "{}")], DOCUMENT_SCHEMA
        )
        p = tmp_path / "good.jsonl"
        p.write_text(
            json.dumps(
                {
                    "custom_id": "doc-000",
                    "method": "POST",
                    "url": "/v1/chat/completions",
                    "body": {"model": "gpt-test", "messages": "[]"},
                }
            )
            + "\n"
        )

        class _Remote:
            def upload(self, path):
                return "file-1"

            def create_batch(self, fid):
                return "batch-1"

        out = submit_batch(
            spark, str(p), SCHEMA_JSON, docs, _Remote(), "job-ok", T0
        )
        assert out.errors == [] and out.total_errors == 0
