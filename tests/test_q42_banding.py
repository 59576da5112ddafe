"""SPARK_GRAFT_Q42_BANDS knob (VERDICT r15 item 5): every banding
config — stock ML path, explicit compound 'R,B', and the bucket-priced
'auto' ladder — must produce the IDENTICAL verified pair set (the sf10
probe's output-equality contract, now pinned at test SF), and bad
configs must fail loudly."""

from __future__ import annotations

import pytest

from batch_processing_system_spark.queries.similarity import (
    _Q42_AUTO_CAND_PER_DOC,
    _minhash_band_table,
    _q42_candidates,
    _shingles,
    q42,
)


def _pairs(df):
    # bounded-collect: verified near-dup pairs are output-sized
    return {(r["doc_id_a"], r["doc_id_b"]) for r in df.collect()}


class TestQ42Banding:
    def test_all_configs_output_identical(self, spark, sf_dir, monkeypatch):
        monkeypatch.delenv("SPARK_GRAFT_Q42_BANDS", raising=False)
        base = _pairs(q42(spark, sf_dir))
        assert base, "fixture corpus must contain planted near-dups"
        for cfg in ("stock", "2,32", "3,64", "auto"):
            monkeypatch.setenv("SPARK_GRAFT_Q42_BANDS", cfg)
            assert _pairs(q42(spark, sf_dir)) == base, cfg

    def test_auto_prices_before_enumerating(self, spark, sf_dir, monkeypatch):
        """auto's pricing query equals the true bucket pair mass: the
        r=1 estimate computed independently here must match what the
        ladder uses to decide (we recompute Σ C(bucket,2) and assert
        the rung auto picks is consistent with the budget rule)."""
        from pyspark.sql import functions as F

        from batch_processing_system_spark.engine.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        sh = _shingles(docs, n=5)
        n_docs = sh.select("doc_id").distinct().count()
        bands = _minhash_band_table(sh, 16, 1)
        est = (
            bands.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("c"))
            .collect()[0]["c"]
        )
        monkeypatch.setenv("SPARK_GRAFT_Q42_BANDS", "auto")
        cand = _q42_candidates(spark, sh)
        n_cand = cand.count()
        if est <= _Q42_AUTO_CAND_PER_DOC * n_docs:
            # first rung accepted: candidates are bounded by the r=1
            # bucket pair mass (dedup can only shrink it)
            assert n_cand <= est
        # whatever rung ran, candidates must cover every true pair
        # (completeness is re-checked by test_all_configs_output_identical
        # via the verify stage; here just sanity-check non-degeneracy)
        assert n_cand > 0

    @pytest.mark.parametrize("bad", ["2", "0,16", "x,y", "1,2,3"])
    def test_bad_config_rejected(self, spark, sf_dir, bad, monkeypatch):
        from batch_processing_system_spark.engine.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        sh = _shingles(docs, n=5)
        monkeypatch.setenv("SPARK_GRAFT_Q42_BANDS", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_Q42_BANDS"):
            _q42_candidates(spark, sh)
