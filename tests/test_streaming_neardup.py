"""Streaming near-dup dedup (streaming/neardup.py): planted-chain
greedy semantics, cross-batch rejection with restart survival, and
corpus-replay equality against the global greedy computed from q46's
exact Jaccard pair set."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.text import q46_neardup_jaccard
from batch_processing_system_spark.streaming.neardup import (
    neardup_batch,
    stream_neardup_documents,
)

from .conftest import SF_SMALL

# 20-word docs with 5-shingles (16 shingles each). B replaces A's last
# 3 words (kills shingle starts 14-16 -> J(A,B)=13/19=0.684 >= 0.6);
# C further replaces the first 3 (J(B,C)=0.684) — but A vs C differ at
# both ends: J(A,C)=10/22=0.455 < 0.6. d unrelated; e too short to
# shingle (< 5 words).
_W = [f"w{i:02d}" for i in range(1, 21)]
DOC_A = " ".join(_W)
DOC_B = " ".join(_W[:17] + ["x18", "x19", "x20"])
DOC_C = " ".join(["y01", "y02", "y03"] + _W[3:17] + ["x18", "x19", "x20"])
DOC_D = "totally different words entirely unrelated content stream batch spark window table"
DOC_E = "too short here"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBatchGreedy:
    def test_chain_keeps_endpoints(self, spark, tmp_path):
        rows = [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_D), (5, DOC_E)]
        decisions = neardup_batch(
            spark,
            _df(spark, rows),
            str(tmp_path / "corpus"),
            str(tmp_path / "bands"),
        ).collect()
        got = {r["doc_id"]: (r["kept"], r["dup_of"]) for r in decisions}
        assert set(got) == {1, 2, 3, 4, 5}
        assert got[1] == (True, None)
        assert got[2] == (False, 1)  # b ~ a
        assert got[3][0] is True     # c ~ b only, but b was rejected
        assert got[4][0] is True
        assert got[5] == (True, None)  # shingle-less docs bypass dedup
        kept_texts = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
        }
        assert kept_texts == {1, 3, 4, 5}

    def test_cross_batch_rejection(self, spark, tmp_path):
        corpus, bands = str(tmp_path / "corpus"), str(tmp_path / "bands")
        d1 = neardup_batch(spark, _df(spark, [(1, DOC_A)]), corpus, bands).collect()
        assert d1[0]["kept"] is True
        d2 = {
            r["doc_id"]: (r["kept"], r["dup_of"])
            for r in neardup_batch(
                spark, _df(spark, [(10, DOC_B), (11, DOC_D)]), corpus, bands
            ).collect()
        }
        assert d2[10] == (False, 1)  # later arrival loses to kept doc 1
        assert d2[11][0] is True


def _greedy_from_pairs(pairs, all_ids):
    """Global greedy ascending doc_id over an exact near-dup pair set."""
    from collections import defaultdict

    nb = defaultdict(set)
    for a, b in pairs:
        nb[b].add(a)
        nb[a].add(b)
    kept = set()
    for d in sorted(all_ids):
        if not any(n in kept and n < d for n in nb[d]):
            kept.add(d)
    return kept


class TestCorpusReplay:
    def test_matches_global_greedy_over_exact_pairs(self, spark, tmp_path):
        docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
        rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
        incoming = tmp_path / "in"
        incoming.mkdir()
        n = len(rows)
        bounds = [0, n // 3, 2 * n // 3, n]
        corpus = str(tmp_path / "corpus")
        bands = str(tmp_path / "bands")
        decisions = str(tmp_path / "decisions")
        for i in range(3):
            wave = incoming / f"wave{i}.jsonl"
            wave.write_text(
                "\n".join(
                    json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                    for r in rows[bounds[i] : bounds[i + 1]]
                )
                + "\n"
            )
            q = (
                stream_neardup_documents(
                    spark, str(incoming), corpus, bands, decisions,
                    str(tmp_path / "ckpt"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        got_kept = {
            r["doc_id"]
            for r in spark.read.parquet(decisions).filter(F.col("kept")).collect()
        }
        exact_pairs = [
            (r["doc_id_a"], r["doc_id_b"])
            for r in q46_neardup_jaccard(spark, SF_SMALL).collect()
        ]
        want_kept = _greedy_from_pairs(exact_pairs, [r["doc_id"] for r in rows])
        assert got_kept == want_kept
        # the kept corpus store mirrors the decision log
        stored = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert stored == got_kept
        # every rejected doc points at a KEPT earlier arrival
        rejected = spark.read.parquet(decisions).filter(~F.col("kept")).collect()
        assert rejected  # the corpus has near-dup clusters
        for r in rejected:
            assert r["dup_of"] in got_kept and r["dup_of"] < r["doc_id"]
