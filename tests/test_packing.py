"""Training-set assembly invariants (q77-q81): packing conserves
every token exactly once, contamination detection catches a planted
leak and never fabricates one, the deterministic shuffle is a
reproducible permutation, and the domain-mix sampler tracks its
target rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.packing import (
    PACK_BUDGET,
    contamination_pairs,
    q77_seq_packing,
    q79_det_shuffle,
    q81_domain_mix,
)

from .conftest import SF_SMALL


class TestSeqPacking:
    def test_token_conservation_and_capacity(self, spark):
        out = q77_seq_packing(spark, SF_SMALL)
        docs = load_table(spark, SF_SMALL, "documents").select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
        )
        # every token of every doc lands in exactly one sequence slot
        per_doc = out.groupBy("doc_id").agg(F.sum("tok_in_seq").alias("packed"))
        diff = per_doc.join(docs, "doc_id").filter(F.col("packed") != F.col("n_tok"))
        assert diff.count() == 0
        assert per_doc.count() == docs.count()

        # no sequence holds more than the budget, and within a shard
        # every sequence except the last is filled to EXACTLY the
        # budget (concat-and-chunk leaves no internal gaps)
        per_seq = out.groupBy("shard", "seq_id").agg(F.sum("tok_in_seq").alias("fill"))
        assert per_seq.filter(F.col("fill") > PACK_BUDGET).count() == 0
        last = per_seq.groupBy("shard").agg(F.max("seq_id").alias("seq_id"))
        not_last = per_seq.join(last, ["shard", "seq_id"], "left_anti")
        assert not_last.filter(F.col("fill") != PACK_BUDGET).count() == 0

    def test_sequences_are_contiguous_per_shard(self, spark):
        out = q77_seq_packing(spark, SF_SMALL)
        seqs = out.select("shard", "seq_id").distinct()
        stats = seqs.groupBy("shard").agg(
            F.min("seq_id").alias("lo"),
            F.max("seq_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        bad = stats.filter(
            (F.col("lo") != 0) | (F.col("n") != F.col("hi") - F.col("lo") + 1)
        )
        assert bad.count() == 0


class TestContamination:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_planted_leak_detected(self, spark):
        leak = "alpha bravo charlie delta echo foxtrot golf hotel india"
        rows = [
            (10, f"the eval doc says {leak} end"),  # eval (10 % 10 == 0)
            (3, f"a train doc copied {leak} verbatim"),  # contaminated
            (7, "completely unrelated words nothing shared here at all ok"),
        ]
        got = contamination_pairs(self._docs(spark, rows)).collect()
        assert [(r["train_doc_id"], r["eval_doc_id"]) for r in got] == [(3, 10)]
        # leak is 9 words -> two distinct shared 8-grams
        assert got[0]["n_shared_grams"] == 2

    def test_no_false_positives_and_no_eval_eval_pairs(self, spark):
        rows = [
            (10, "one two three four five six seven eight nine"),
            (20, "one two three four five six seven eight nine"),  # eval dup: ignored
            (5, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
        ]
        assert contamination_pairs(self._docs(spark, rows)).count() == 0


class TestDetShuffle:
    def test_permutation_and_determinism(self, spark):
        a = q79_det_shuffle(spark, SF_SMALL)
        docs = load_table(spark, SF_SMALL, "documents")
        assert a.count() == docs.count()
        assert a.select("doc_id").distinct().count() == docs.count()
        # positions are 1..n within every bucket
        stats = a.groupBy("bucket").agg(
            F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count(F.lit(1)).alias("n")
        )
        assert stats.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
        # bit-for-bit reproducible
        b = q79_det_shuffle(spark, SF_SMALL)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # and actually shuffled: bucket order is not doc_id order
        first_bucket = sorted(
            r["doc_id"] for r in a.filter(F.col("bucket") == 0).collect()
        )
        n0 = len(first_bucket)
        assert first_bucket != list(range(n0))


class TestPackingProperties:
    """Hypothesis cross-check: pack random corpora at random budgets
    against a pure-Python reference packer."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.integers(min_value=0, max_value=12),  # words per doc (0 = dropped)
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(sizes=corpus, budget=st.integers(min_value=1, max_value=20))
    def test_matches_reference_packer(self, spark, sizes, budget):
        from batch_processing_system_spark.queries.packing import pack_sequences

        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            (r["shard"], r["seq_id"], r["doc_id"]): r["tok_in_seq"]
            for r in pack_sequences(docs, budget=budget, shards=3).collect()
        }
        # reference: lay docs end-to-end per shard in doc_id order
        want = {}
        offsets = {}
        for i, n in enumerate(rows):
            doc_id, text = rows[i]
            n_tok = len(text.split()) if text else 0
            # split("", " ") yields [''] (size 1) — mirror Spark exactly
            n_tok = max(n_tok, 1) if text == "" else n_tok
            if n_tok == 0:
                continue
            shard = doc_id % 3
            start = offsets.get(shard, 0)
            end = start + n_tok
            offsets[shard] = end
            for seq in range(start // budget, (end - 1) // budget + 1):
                lo, hi = max(start, seq * budget), min(end, (seq + 1) * budget)
                want[(shard, seq, doc_id)] = hi - lo
        assert got == want


class TestDomainMix:
    def test_kept_fraction_tracks_rate(self, spark):
        rows = q81_domain_mix(spark, SF_SMALL).collect()
        assert rows and all(0 <= r["n_kept"] <= r["n_total"] for r in rows)
        # md5-prefix draws are uniform: pooled by rate tier, the kept
        # fraction must sit near the tier's target (binomial 4-sigma)
        import collections
        by_rate = collections.defaultdict(lambda: [0, 0])
        for r in rows:
            by_rate[r["rate"]][0] += r["n_kept"]
            by_rate[r["rate"]][1] += r["n_total"]
        for rate, (kept, total) in by_rate.items():
            sigma = (rate * (1 - rate) * total) ** 0.5
            assert abs(kept - rate * total) <= max(4 * sigma, 1.0), (
                rate, kept, total
            )
