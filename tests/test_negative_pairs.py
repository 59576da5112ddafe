"""r53 negative-pair sampling semantics: exactly K partners per doc,
never self, deterministic across runs, and the shift trick keeps the
partner distribution spread (no rank-0 pile-up)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.packing import (
    NEG_K,
    r53_negative_pairs,
)
from tests.conftest import SF_SMALL


class TestNegativePairs:
    def test_exactly_k_never_self_deterministic(self, spark):
        rows = r53_negative_pairs(spark, SF_SMALL).collect()
        per_doc = Counter(r["doc_id"] for r in rows)
        assert set(per_doc.values()) == {NEG_K}
        assert all(r["doc_id"] != r["partner_id"] for r in rows)
        again = r53_negative_pairs(spark, SF_SMALL).collect()
        assert {(r["doc_id"], r["neg_idx"], r["partner_id"]) for r in rows} == {
            (r["doc_id"], r["neg_idx"], r["partner_id"]) for r in again
        }

    def test_partner_spread(self, spark):
        rows = r53_negative_pairs(spark, SF_SMALL).collect()
        hits = Counter(r["partner_id"] for r in rows)
        # 1000 draws over 500 docs: no partner should absorb more than
        # ~2% of the mass if the digest uniform is healthy
        assert max(hits.values()) <= 20
        # and a decent fraction of the corpus is hit at least once
        assert len(hits) > 300


class TestRollingActivesHll:
    def test_bracket_vs_exact_and_determinism(self, spark):
        from batch_processing_system_spark.queries.wrangling import (
            r50_rolling_actives,
            r56_rolling_actives_hll,
        )

        for sf in (SF_SMALL, "/root/testdata/sf0.01"):
            exact = {
                r["day"]: r["active_users"]
                for r in r50_rolling_actives(spark, sf).collect()
            }
            est = {
                r["day"]: r["active_users_est"]
                for r in r56_rolling_actives_hll(spark, sf).collect()
            }
            assert est.keys() == exact.keys(), sf
            for day, e in est.items():
                x = exact[day]
                assert abs(e - x) <= max(2, 0.05 * x), (sf, day, e, x)
            again = {
                r["day"]: r["active_users_est"]
                for r in r56_rolling_actives_hll(spark, sf).collect()
            }
            assert again == est, sf


class TestRfm:
    def test_quintiles_balanced_and_best_is_one(self, spark):
        from batch_processing_system_spark.queries.wrangling import r66_rfm
        from batch_processing_system_spark.engine.io import load_table

        rows = r66_rfm(spark, SF_SMALL).collect()
        total = sum(r["n_users"] for r in rows)
        events = load_table(spark, SF_SMALL, "events")
        n_buyers = (
            events.where(
                (F.col("event_type") == "purchase") & F.col("value").isNotNull()
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert total == n_buyers
        # each score dimension partitions users into balanced quintiles
        for dim in ("r_score", "f_score", "m_score"):
            per = {}
            for r in rows:
                per[r[dim]] = per.get(r[dim], 0) + r["n_users"]
            assert set(per) == {1, 2, 3, 4, 5}, dim
            assert max(per.values()) - min(per.values()) <= 1, (dim, per)
