"""BM25 retrieval (q88) and unigram-perplexity gate (q89): semantic
unit tests on crafted corpora plus the rounding-margin measurement that
justifies the tier-1 claim (per-term float scores are rounded to 6dp
before the DECIMAL-exact sum; the only cross-engine risk is a score
within ~1ulp of a 6dp boundary)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    PPL_NLL_THRESHOLD,
    bm25_topk,
    unigram_nll,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBM25:
    def test_ranking_prefers_tf_and_short_docs(self, spark):
        pad = " ".join("filler" for _ in range(20))
        docs = _docs(
            spark,
            [
                (1, "join join join hash"),          # high tf, short
                (2, "join hash " + pad),             # both terms, long
                (3, "join " + pad),                  # one term, long
                (4, pad),                            # no query terms
            ],
        )
        out = bm25_topk(docs, ["join", "hash"], k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert ids[0] == 1  # tf=3 for join + hash, shortest doc
        assert 4 not in ids  # zero-match docs never surface
        scores = [r["bm25"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_matches_pure_python_reference(self, spark):
        """Independent BM25 implementation (plain Python) must agree
        with the Spark dataflow to the 6dp-rounded-sum contract."""
        rows = [
            (i, " ".join(["join"] * (i % 4) + ["hash"] * (i % 3) + ["x"] * (5 + i)))
            for i in range(1, 13)
        ]
        docs = _docs(spark, rows)
        terms = ["join", "hash"]
        got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, terms, k=100).collect()}

        split = {i: t.split(" ") for i, t in rows}
        dl = {i: len(ws) for i, ws in split.items()}
        n_docs = len(rows)
        avgdl = sum(dl.values()) / n_docs
        tf = {
            (i, t): split[i].count(t)
            for i in split
            for t in terms
            if split[i].count(t) > 0
        }
        df = {t: sum(1 for (i, t2) in tf if t2 == t) for t in terms}
        want = {}
        for (i, t), f in tf.items():
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * (f * (1 + BM25_K1)) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dl[i] / avgdl)
            )
            want[i] = want.get(i, 0.0) + round(s, 6)
        for i, w in want.items():
            assert abs(got[i] - w) < 1e-9, (i, got[i], w)

    def test_6dp_margins_on_fixture_corpus(self, spark):
        """Measure how far every per-term score sits from its 6dp
        rounding boundary on the real sf0.01 corpus — the tier-1 claim
        needs margins >> double-noise (~1e-15)."""
        from batch_processing_system_spark.engine.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        toks = docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("token"),
        )
        perdoc = toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("token") == t).cast("long")).alias(f"tf_{i}")
                for i, t in enumerate(BM25_QUERY_TERMS)
            ],
        )
        rows = perdoc.collect()
        n_docs = len(rows)
        avgdl = sum(r["dl"] for r in rows) / n_docs
        df = [
            sum(1 for r in rows if r[f"tf_{i}"] > 0)
            for i in range(len(BM25_QUERY_TERMS))
        ]
        worst = 1.0
        for r in rows:
            for i in range(len(BM25_QUERY_TERMS)):
                f = r[f"tf_{i}"]
                if f == 0:
                    continue
                idf = math.log(1.0 + (n_docs - df[i] + 0.5) / (df[i] + 0.5))
                s = idf * (f * (1 + BM25_K1)) / (
                    f + BM25_K1 * (1 - BM25_B + BM25_B * r["dl"] / avgdl)
                )
                frac = abs(s * 1e6 - round(s * 1e6))
                worst = min(worst, min(frac, 1 - frac))
        # worst-case distance to a 6dp boundary, in units of 1e-6
        assert worst > 1e-6, worst  # i.e. > 1e-12 absolute — 1000x double noise


class TestBM25TermHandling:
    """ADVICE r3 low item: query terms must pass through typed columns
    (no SQL splicing) and a repeated term must not double-count df or
    score twice."""

    CORPUS = [
        (1, "join join hash x y"),
        (2, "join filler filler filler"),
        (3, "hash only here"),
        (4, "nothing relevant at all"),
    ]

    def test_duplicate_terms_collapse(self, spark):
        docs = _docs(spark, self.CORPUS)
        once = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["join", "hash"]).collect()}
        dup = {
            r["doc_id"]: r["bm25"]
            for r in bm25_topk(docs, ["join", "hash", "join", "join"]).collect()
        }
        assert once == dup and len(once) == 3

    def test_quote_bearing_term_is_safe(self, spark):
        # would have broken (or worse, injected) the old stack() splice
        docs = _docs(
            spark,
            [(1, "o'brien said hello"), (2, "plain words only"), (3, "o'brien o'brien")],
        )
        out = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["o'brien"]).collect()}
        assert set(out) == {1, 3}
        assert out[3] > out[1]  # higher tf wins, same dl-ish

    def test_comma_and_paren_terms_are_safe(self, spark):
        docs = _docs(spark, [(1, "a,b (c) d"), (2, "a,b x y"), (3, "clean")])
        out = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["a,b", "(c)"]).collect()}
        assert set(out) == {1, 2}


class TestUnigramPPL:
    def test_uniform_corpus_hits_log_vocab(self, spark):
        # 4 equally-frequent words -> every doc's avg NLL == ln(4)
        docs = _docs(spark, [(1, "a b c d"), (2, "b a d c"), (3, "c d a b")])
        out = unigram_nll(docs).collect()
        for r in out:
            assert abs(r["avg_nll"] - round(math.log(4), 4)) <= 1e-4
            assert r["n_tokens"] == 4

    def test_repetitive_doc_scores_lower(self, spark):
        docs = _docs(
            spark,
            [(1, " ".join(["the"] * 50)), (2, " ".join(f"w{i}" for i in range(50)))],
        )
        out = {r["doc_id"]: r["avg_nll"] for r in unigram_nll(docs).collect()}
        # doc 1 repeats the corpus's dominant token -> far more likely
        assert out[1] < out[2]

    def test_4dp_margins_on_fixture_corpus(self, spark):
        """Mirror of BM25's test_6dp_margins: q89's tier-1 claim rests
        on ROUND(avg_nll, 4) agreeing across engines, which needs every
        per-doc average to sit far from a 4dp rounding boundary AND far
        from the keep threshold. Measured at sf0.01 (the driver's
        correctness SF): worst boundary margin 3.3e-3 in 1e-4 units
        (3.3e-7 absolute, ~1e6x double noise), min threshold distance
        6.6e-3."""
        import duckdb
        from collections import Counter

        con = duckdb.connect()
        rows = con.execute(
            "SELECT doc_id, text FROM "
            "read_parquet('/root/testdata/sf0.01/documents.parquet')"
        ).fetchall()
        docs = {i: [w for w in t.split(" ") if w] for i, t in rows}
        corpus: Counter = Counter()
        for ws in docs.values():
            corpus.update(ws)
        total = sum(corpus.values())
        nll6 = {t: round(-math.log(c / total), 6) for t, c in corpus.items()}
        worst, worst_thr = 1.0, 10.0
        for ws in docs.values():
            tf = Counter(ws)
            avg = sum(f * nll6[t] for t, f in tf.items()) / len(ws)
            frac = abs(avg * 1e4 - round(avg * 1e4))
            worst = min(worst, min(frac, 1 - frac))
            worst_thr = min(worst_thr, abs(round(avg, 4) - PPL_NLL_THRESHOLD))
        # distance to a 4dp boundary, in units of 1e-4
        assert worst > 1e-4, worst  # > 1e-8 absolute
        # the keep flag compares the already-rounded value; it must not
        # sit on the threshold either
        assert worst_thr > 1e-3, worst_thr

    def test_keep_flag_consistent_with_threshold(self, spark):
        from batch_processing_system_spark.queries.retrieval import q89_unigram_ppl

        out = q89_unigram_ppl(spark, "/root/testdata/sf0.001")
        bad = out.filter(
            (F.col("avg_nll") <= PPL_NLL_THRESHOLD) != F.col("keep")
        ).count()
        assert bad == 0
        # the gate must actually separate: both classes present
        kinds = {r["keep"] for r in out.select("keep").distinct().collect()}
        assert kinds == {True, False}
