"""BPE tokenizer tests: hand-computed merges, engine ≡ independent
reference on random corpora (training AND apply), and full-corpus
equality of the Spark pipeline vs the reference at sf0.001."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.bpe import (
    bpe_word,
    dump_merges,
    load_merges,
    merge_ranks,
    tokenize_text,
    train_bpe,
    train_bpe_on_corpus,
)
from tests._bpe_reference import ref_apply_word, ref_tokenize, ref_train

from .conftest import SF_SMALL


class TestTraining:
    def test_hand_computed_merges(self):
        # 'aaab' x3, 'aab' x2: pair counts round 1:
        #   (a,a): 2*3 + 1*2 = 8  <- best
        #   (a,b): 3+2=5, (b,</w>): 5
        # after merging 'aa': words 'aa a b' x3 -> pairs (aa,a)=3 ...
        merges = train_bpe({"aaab": 3, "aab": 2}, num_merges=3)
        assert merges[0] == ("a", "a")
        # round 2: 'aa a b</w>'x3, 'aa b</w>'x2 -> (aa,b):2, (aa,a):3,
        # (a,b):3, (b,</w>):5 <- best is (b,'</w>')
        assert merges[1] == ("b", "</w>")

    def test_tie_breaks_lexicographic(self):
        # 'ab' x2 and 'cd' x2: pairs (a,b)=2,(c,d)=2,(b,</w>)=2,(d,</w>)=2
        # -> smallest pair lexicographically is (a,b)
        merges = train_bpe({"ab": 2, "cd": 2}, num_merges=1)
        assert merges[0] == ("a", "b")

    def test_stops_when_no_repeats(self):
        merges = train_bpe({"xy": 1}, num_merges=50)
        assert merges == []  # every pair occurs once

    words = st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )

    @given(words=words, counts=st.lists(st.integers(1, 9), min_size=12, max_size=12))
    @settings(max_examples=30, deadline=None)
    def test_matches_independent_trainer(self, words, counts):
        wc = {w: c for w, c in zip(words, counts)}
        assert train_bpe(wc, 20) == ref_train(wc, 20)


class TestApply:
    @given(
        words=TestTraining.words,
        probe=st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=10),
    )
    @settings(max_examples=50, deadline=None)
    def test_matches_independent_apply(self, words, probe):
        """Engine lowest-rank-first loop ≡ reference single-pass in rank
        order, for merge tables produced by consistent training —
        including words never seen in training."""
        wc = {w: 2 for w in words}
        merges = train_bpe(wc, 15)
        ranks = merge_ranks(merges)
        assert bpe_word(probe, ranks) == ref_apply_word(probe, merges)

    def test_token_roundtrip_reconstructs_text(self):
        merges = train_bpe({"low": 5, "lowest": 2, "newer": 6}, 10)
        ranks = merge_ranks(merges)
        text = "lowest newer low unseen"
        toks = tokenize_text(text, ranks)
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == text


class TestArtifactAndCorpus:
    def test_merges_file_roundtrip(self, tmp_path):
        merges = train_bpe({"alpha": 3, "alps": 2}, 8)
        p = tmp_path / "m.txt"
        p.write_text(dump_merges(merges), encoding="utf-8")
        assert load_merges(str(p)) == merges

    def test_committed_artifact_loads(self):
        from batch_processing_system_spark.queries.tokenize import MERGES_PATH

        merges = load_merges(MERGES_PATH)
        assert len(merges) > 50
        assert all(len(m) == 2 for m in merges)

    def test_spark_pipeline_equals_reference_on_corpus(self, spark):
        """Full sf0.001 corpus: the Arrow-batched UDF pipeline produces
        EXACTLY the reference tokenization for every document."""
        from pyspark.sql import functions as F

        from batch_processing_system_spark.engine.io import load_table
        from batch_processing_system_spark.functions.bpe import make_tokenize_udf
        from batch_processing_system_spark.queries.tokenize import MERGES_PATH

        merges = load_merges(MERGES_PATH)
        docs = load_table(spark, SF_SMALL, "documents")
        tok = make_tokenize_udf(merges)
        got = {
            r["doc_id"]: r["toks"]
            for r in docs.select("doc_id", tok(F.col("text")).alias("toks")).collect()
        }
        src = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
        assert len(got) == len(src)
        for doc_id, text in src.items():
            assert got[doc_id] == ref_tokenize(text, merges), doc_id

    def test_training_on_corpus_is_deterministic(self, spark):
        from batch_processing_system_spark.engine.io import load_table

        docs = load_table(spark, SF_SMALL, "documents")
        m1 = train_bpe_on_corpus(docs, num_merges=30)
        m2 = train_bpe_on_corpus(docs, num_merges=30)
        assert m1 == m2 and len(m1) == 30
