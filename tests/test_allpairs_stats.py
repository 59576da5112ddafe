"""Tests for r47 ANOVA, r48 AllPairs prefix filtering, r49
sorted-neighborhood blocking: independent-reference checks, the
prefix-filter completeness guarantee on a planted hot cluster (the
case q46 needs its rarest-k exemption for), and cross-partition
neighbor pairing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.text import (
    q46_neardup_jaccard,
    r48_allpairs_jaccard,
)
from batch_processing_system_spark.queries.wrangling import (
    r47_anova,
    r49_sorted_neighborhood,
)
from tests.conftest import SF_SMALL, SF_MEDIUM


def _pairs(df):
    return {
        (r["doc_id_a"], r["doc_id_b"], r["n_common"]) for r in df.collect()
    }


class TestAllPairs:
    def test_equals_q46_on_real_corpus(self, spark):
        for sf in (SF_SMALL, SF_MEDIUM):
            assert _pairs(r48_allpairs_jaccard(spark, sf)) == _pairs(
                q46_neardup_jaccard(spark, sf)
            ), sf

    def test_hot_cluster_complete_by_construction(self, spark, tmp_path):
        # 30 near-identical docs: every shared shingle has df≈30, far
        # above q46's default cut — q46 needs its rarest-k exemption;
        # r48's prefix guarantee needs NO special case. All C(30,2)
        # above-threshold pairs must appear.
        base = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(30):
            words = list(base)
            words[39] = f"tail{i}"  # one divergent word -> J ~ 35/37
            texts.append(" ".join(words))
        texts.append(" ".join(f"z{i}" for i in range(40)))  # unrelated
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        got = _pairs(r48_allpairs_jaccard(spark, str(tmp_path)))
        expected = {(a, b) for a in range(30) for b in range(a + 1, 30)}
        assert {(a, b) for a, b, _ in got} == expected
        # and the unrelated doc pairs with nothing
        assert all(30 not in (a, b) for a, b, _ in got)

    def test_prefix_indexes_less_than_half_the_shingle_mass(self, spark):
        # the scale claim: prefix filtering indexes ~n - ceil(0.6 n) + 1
        # of each doc's shingles; measure the global fraction
        from batch_processing_system_spark.engine.io import load_table
        from batch_processing_system_spark.queries.similarity import _shingles

        docs = load_table(spark, SF_SMALL, "documents")
        sh = _shingles(docs, n=5)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        row = sizes.agg(
            F.sum("n").alias("total"),
            F.sum(
                F.col("n") - F.expr("(6 * n + 9) div 10") + 1
            ).alias("prefix"),
        ).collect()[0]
        assert row["prefix"] / row["total"] < 0.5


class TestAnova:
    def test_matches_numpy_reference(self, spark):
        from batch_processing_system_spark.engine.io import load_table

        events = load_table(spark, SF_SMALL, "events")
        rows = events.where(F.col("value").isNotNull()).select(
            "event_type", "value"
        ).collect()
        groups: dict[str, list[float]] = {}
        for r in rows:
            groups.setdefault(r["event_type"], []).append(r["value"])
        k = len(groups)
        n = sum(len(v) for v in groups.values())
        grand = sum(sum(v) for v in groups.values()) / n
        ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
        ssw = sum(
            sum((x - sum(v) / len(v)) ** 2 for x in v)
            for v in groups.values()
        )
        f_ref = (ssb / (k - 1)) / (ssw / (n - k))
        got = r47_anova(spark, SF_SMALL).collect()[0]
        assert got["k"] == k and got["n"] == n
        assert math.isclose(got["f_stat"], f_ref, rel_tol=1e-4)
        assert math.isclose(got["ss_between"], ssb, rel_tol=1e-6)
        assert math.isclose(got["ss_within"], ssw, rel_tol=1e-9)

    def test_4dp_margins(self, spark):
        for sf in (SF_SMALL, SF_MEDIUM):
            row = r47_anova(spark, sf).collect()[0]
            # ROUND(…,4) outputs come from a deterministic ordered fold,
            # but measure the boundary distance anyway (the r05 rule)
            for c in ("ss_between", "ss_within", "f_stat"):
                frac = (abs(row[c]) * 10**4) % 1.0
                assert abs(frac - 0.5) > 1e-6, (sf, c, row[c])


class TestSortedNeighborhood:
    def test_planted_window_and_threshold(self, spark, tmp_path):
        # sorted order: aaaa1..aaaa5 are each other's neighbors;
        # aaaa5/zzzz sit far apart in edit distance. aaaa1 vs aaaa5 is
        # gap 4 — OUTSIDE the window even though dist=1 (the blocking
        # tradeoff, asserted so it stays deliberate).
        names = ["aaaa1", "aaaa2", "aaaa3", "aaaa4", "aaaa5", "zzzz"]
        spark.createDataFrame(
            [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
            "p_partkey bigint, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "part.parquet")
        )
        got = {
            (r["name_a"], r["name_b"], r["gap"], r["dist"])
            for r in r49_sorted_neighborhood(spark, str(tmp_path)).collect()
        }
        expected = {
            (f"aaaa{i}", f"aaaa{j}", j - i, 1)
            for i in range(1, 6)
            for j in range(i + 1, min(i + 4, 6))
        }
        assert got == expected
        assert ("aaaa1", "aaaa5", 4, 1) not in got  # outside the window

    def test_pairs_cross_range_partition_boundaries(self, spark, tmp_path):
        # 64 names over 8 range partitions -> ~7 boundaries; the rank
        # equi-join must produce exactly w*(n) - (w terms at the tail)
        # candidate pairs regardless of where partition edges fall
        names = [f"name{i:03d}" for i in range(64)]
        spark.createDataFrame(
            [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
            "p_partkey bigint, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "part.parquet")
        )
        got = r49_sorted_neighborhood(spark, str(tmp_path)).collect()
        # every adjacent pair differs only in the 3-digit suffix ->
        # dist <= 3 always; total pairs = 63 + 62 + 61 (gaps 1..3)
        assert len(got) == 63 + 62 + 61
        gaps = sorted(r["gap"] for r in got)
        assert gaps.count(1) == 63 and gaps.count(2) == 62 and gaps.count(3) == 61
