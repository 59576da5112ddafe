"""Planted-data semantics tests for the round-6 wrangling operators
(queries/wrangling.py r01-r07). The oracle harness proves Spark==DuckDB
on the synthetic tables; these prove the SEMANTICS are the intended ones
on hand-built corner cases (gaps, repeated states, first-session
conversions, bloom false positives, known edit distances, real nulls)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_SMALL
from batch_processing_system_spark.queries.wrangling import (
    _BLOOM_PRICE,
    r01_gapfill,
    r02_fuzzy_match,
    r03_profile,
    r04_scd2,
    r05_percentiles,
    r06_attribution,
    r07_bloom_semi,
)

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _ts(day: int, h: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, h, 0, 0)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestGapfill:
    ROWS = [
        # user 1: days 1, 4 observed -> days 2,3 forward-filled from day 1
        (1, _ts(1), 1, "view", 10.0, "{}"),
        (2, _ts(1, 6), 1, "view", 2.5, "{}"),
        (3, _ts(4), 1, "click", 7.0, "{}"),
        # user 2: single day -> single row, no fill
        (4, _ts(9), 2, "view", 3.0, "{}"),
    ]

    def test_fill_semantics(self, spark, tmp_path):
        sf = _write_events(spark, tmp_path, self.ROWS)
        out = {(r["user_id"], r["day"]): r for r in r01_gapfill(spark, sf).collect()}
        assert len(out) == 5  # u1 days 1-4, u2 day 9
        d = dt.date
        assert out[(1, d(2024, 1, 1))]["value_ff"] == pytest.approx(12.5)
        assert out[(1, d(2024, 1, 1))]["observed"] is True
        # gap days carry the previous observed value
        for gap_day in (2, 3):
            row = out[(1, d(2024, 1, gap_day))]
            assert row["value_ff"] == pytest.approx(12.5)
            assert row["observed"] is False
        assert out[(1, d(2024, 1, 4))]["value_ff"] == pytest.approx(7.0)
        assert out[(2, d(2024, 1, 9))]["observed"] is True


class TestScd2:
    ROWS = [
        # user 1: view,view,click,view -> 3 intervals (consecutive dups merge)
        (1, _ts(1), 1, "view", 0.0, "{}"),
        (2, _ts(2), 1, "view", 0.0, "{}"),
        (3, _ts(3), 1, "click", 0.0, "{}"),
        (4, _ts(4), 1, "view", 0.0, "{}"),
    ]

    def test_intervals(self, spark, tmp_path):
        sf = _write_events(spark, tmp_path, self.ROWS)
        rows = sorted(
            r04_scd2(spark, sf).collect(), key=lambda r: r["valid_from_us"]
        )
        assert [r["state"] for r in rows] == ["view", "click", "view"]
        # intervals tile: each valid_to equals the next valid_from
        assert rows[0]["valid_to_us"] == rows[1]["valid_from_us"]
        assert rows[1]["valid_to_us"] == rows[2]["valid_from_us"]
        assert rows[2]["valid_to_us"] is None and rows[2]["is_current"] is True
        assert all(r["is_current"] is False for r in rows[:2])


class TestAttribution:
    ROWS = [
        # user 1: view(t1) click(t2) purchase(t3) purchase(t4)
        #   -> both purchases attribute to the click (latest preceding touch)
        (1, _ts(1, 1), 1, "view", 0.0, "{}"),
        (2, _ts(1, 2), 1, "click", 0.0, "{}"),
        (3, _ts(1, 3), 1, "purchase", 0.0, "{}"),
        (4, _ts(1, 4), 1, "purchase", 0.0, "{}"),
        # user 2: purchase with NO prior touch -> NULL attribution row kept
        (5, _ts(2), 2, "purchase", 0.0, "{}"),
        # user 3: touch AFTER the purchase must not attribute
        (6, _ts(3, 5), 3, "purchase", 0.0, "{}"),
        (7, _ts(3, 6), 3, "click", 0.0, "{}"),
    ]

    def test_last_touch(self, spark, tmp_path):
        sf = _write_events(spark, tmp_path, self.ROWS)
        out = {r["purchase_id"]: r for r in r06_attribution(spark, sf).collect()}
        assert set(out) == {3, 4, 5, 6}
        assert out[3]["touch_id"] == 2 and out[3]["touch_type"] == "click"
        assert out[4]["touch_id"] == 2  # purchase at t3 is not a touch
        assert out[3]["gap_us"] == 3600 * 10**6
        assert out[5]["touch_id"] is None and out[5]["gap_us"] is None
        assert out[6]["touch_id"] is None  # later touch never attributes


class TestFuzzyMatch:
    def test_known_distances(self, spark, tmp_path):
        rows = [
            (1, "cold widget", "Brand#1", "X"),
            (2, "bold widget", "Brand#1", "X"),   # dist 1 from cold widget
            (3, "colder widget", "Brand#1", "X"), # dist 2 from cold widget
            (4, "cold gizmo", "Brand#1", "X"),    # different block
            (5, "completely different widget", "Brand#1", "X"),  # > 3
            (6, "cold widget", "Brand#2", "X"),   # duplicate name, deduped
        ]
        spark.createDataFrame(
            rows, "p_partkey bigint, p_name string, p_brand string, p_type string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        out = {
            (r["left_name"], r["right_name"]): r["dist"]
            for r in r02_fuzzy_match(spark, str(tmp_path)).collect()
        }
        assert out == {
            ("bold widget", "cold widget"): 1,
            ("bold widget", "colder widget"): 3,
            ("cold widget", "colder widget"): 2,
        }


class TestProfile:
    def test_null_accounting(self, spark, tmp_path):
        rows = [
            (1, 10, "O", 5.0, _ts(1), "HIGH"),
            (2, None, "F", None, _ts(2), "LOW"),
            (3, 10, None, 7.5, None, None),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        out = {r["col_name"]: r for r in r03_profile(spark, str(tmp_path)).collect()}
        assert set(out) == {
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        }
        assert all(r["n_rows"] == 3 for r in out.values())
        assert out["o_custkey"]["n_nulls"] == 1
        assert out["o_custkey"]["n_distinct"] == 1
        assert out["o_totalprice"]["min_num"] == 5.0
        assert out["o_totalprice"]["max_num"] == 7.5
        assert out["o_orderstatus"]["min_str"] == "F"
        assert out["o_orderstatus"]["max_str"] == "O"
        assert out["o_orderstatus"]["min_num"] is None
        # timestamp summarised as epoch seconds
        assert out["o_orderdate"]["min_num"] == _ts(1).replace(
            tzinfo=dt.timezone.utc
        ).timestamp()


class TestBloomSemi:
    def test_equals_exact_semi_join(self, spark, tmp_path):
        # 200 customers, a handful with qualifying orders; the bloom
        # prefilter may pass false positives — the exact verify must
        # remove every one (result == plain semi-join).
        customers = [(k, f"Customer#{k:09d}", 0, 0.0, "SEG") for k in range(200)]
        spark.createDataFrame(
            customers,
            "c_custkey bigint, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "customer.parquet")
        )
        qualifying = {3, 77, 150}
        orders = [
            (i, k, "O", _BLOOM_PRICE + 1.0, _ts(1), "HIGH")
            for i, k in enumerate(sorted(qualifying))
        ] + [(99, 5, "O", 1.0, _ts(1), "LOW")]  # below threshold
        spark.createDataFrame(
            orders,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r["c_custkey"] for r in r07_bloom_semi(spark, str(tmp_path)).collect()}
        assert got == qualifying


class TestWeightedSample:
    @staticmethod
    def _python_reference(sf_dir):
        """Independent driver-side computation of the A-ES selection
        (hashlib md5, math.log) — no Spark/DuckDB expressions."""
        import hashlib
        import math

        import duckdb

        rows = duckdb.sql(
            f"SELECT doc_id, source, n_chars FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
        keyed = []
        for doc_id, source, n_chars in rows:
            h = hashlib.md5(f"wsample1{doc_id}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 1) / 4294967296.0
            keyed.append((-math.log(u) / n_chars, doc_id, source, n_chars))
        keyed.sort(key=lambda t: (t[0], t[1]))
        return keyed

    def test_matches_python_reference(self, spark):
        from batch_processing_system_spark.queries.wrangling import (
            _WS_K,
            r10_weighted_sample,
        )

        keyed = self._python_reference("/root/testdata/sf0.001")
        want = {(d, s, n) for _, d, s, n in keyed[:_WS_K]}
        got = {
            (r["doc_id"], r["source"], r["n_chars"])
            for r in r10_weighted_sample(spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want

    def test_k_boundary_margin(self):
        """The only float-sensitive comparison is between the k-th and
        (k+1)-th keys; the measured gap must dwarf cross-engine libm
        noise (~1e-16 relative)."""
        from batch_processing_system_spark.queries.wrangling import _WS_K

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            keyed = self._python_reference(sf)
            gap = keyed[_WS_K][0] - keyed[_WS_K - 1][0]
            assert gap > 1e-12, (sf, gap)

    def test_sample_is_weight_biased(self, spark):
        """Inclusion probability ∝ n_chars: the sample's mean length
        must exceed the corpus mean (the point of weighting)."""
        import duckdb

        from batch_processing_system_spark.queries.wrangling import r10_weighted_sample

        sample = r10_weighted_sample(spark, "/root/testdata/sf0.01").collect()
        samp_mean = sum(r["n_chars"] for r in sample) / len(sample)
        corpus_mean = duckdb.sql(
            "SELECT avg(n_chars) FROM "
            "read_parquet('/root/testdata/sf0.01/documents.parquet')"
        ).fetchone()[0]
        assert samp_mean > corpus_mean


class TestChiSquare:
    def test_independent_table_scores_zero(self, spark, tmp_path):
        """A perfectly independent contingency table (every cell equals
        its expectation) must score chi2 = 0."""
        rows = []
        eid = 0
        # 2 types x 2 weekdays, counts chosen so margins factor exactly:
        # type a: 2 on Mon, 4 on Tue; type b: 1 on Mon, 2 on Tue
        for etype, day, n in [("a", 8, 2), ("a", 9, 4), ("b", 8, 1), ("b", 9, 2)]:
            for _ in range(n):
                rows.append((eid, _ts(day), 1, etype, 0.0, "{}"))
                eid += 1
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r11_chisq

        out = r11_chisq(spark, sf).collect()[0]
        assert out["n"] == 9 and out["dof"] == 1
        assert out["chi2"] == pytest.approx(0.0, abs=1e-9)

    def test_hand_computed_statistic(self, spark, tmp_path):
        # 2x2 table [[3,1],[1,3]]: n=8, margins all 4, expectation 2
        # chi2 = 4 * (3-2)^2/2 = ... each cell contributes (±1)^2/2 -> 4*0.5 = 2
        rows = []
        eid = 0
        for etype, day, n in [("a", 8, 3), ("a", 9, 1), ("b", 8, 1), ("b", 9, 3)]:
            for _ in range(n):
                rows.append((eid, _ts(day), 1, etype, 0.0, "{}"))
                eid += 1
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r11_chisq

        out = r11_chisq(spark, sf).collect()[0]
        assert out["chi2"] == pytest.approx(2.0, abs=1e-9)

    def test_rounding_margin_on_real_data(self):
        """chi2 is the one float accumulation; its distance to the 6dp
        rounding boundary must dwarf cross-engine sum-order noise."""
        import duckdb

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            v = duckdb.sql(
                f"""
                WITH cells AS (
                    SELECT event_type AS r, dayofweek(CAST(ts AS TIMESTAMP)) AS c,
                           COUNT(*) AS o
                    FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
                ),
                rt AS (SELECT r, SUM(o) AS nr FROM cells GROUP BY r),
                ct AS (SELECT c, SUM(o) AS nc FROM cells GROUP BY c),
                g AS (SELECT SUM(o) AS n FROM cells)
                SELECT SUM(pow(CAST(o AS DOUBLE)
                        - CAST(nr AS DOUBLE)*CAST(nc AS DOUBLE)/CAST(g.n AS DOUBLE), 2)
                        / (CAST(nr AS DOUBLE)*CAST(nc AS DOUBLE)/CAST(g.n AS DOUBLE)))
                FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN g
                """
            ).fetchone()[0]
            margin = abs(v * 10**6 - round(v * 10**6) - 0.5)
            assert margin > 1e-3, (sf, v, margin)


class TestKsTest:
    def _ks(self, spark, tmp_path, pvals, cvals):
        rows = []
        eid = 0
        for v in pvals:
            rows.append((eid, _ts(1), 1, "purchase", float(v), "{}"))
            eid += 1
        for v in cvals:
            rows.append((eid, _ts(1), 1, "click", float(v), "{}"))
            eid += 1
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r12_ks_test

        return r12_ks_test(spark, sf).collect()[0]

    def test_identical_samples_score_zero(self, spark, tmp_path):
        out = self._ks(spark, tmp_path, [1, 2, 3, 4], [1, 2, 3, 4])
        assert (out["n1"], out["n2"], out["d_num"]) == (4, 4, 0)
        assert out["ks_d"] == 0.0

    def test_disjoint_supports_score_one(self, spark, tmp_path):
        out = self._ks(spark, tmp_path, [1, 2, 3], [10, 11, 12])
        assert out["d_num"] == 9  # 3*3
        assert out["ks_d"] == 1.0

    def test_hand_computed_d(self, spark, tmp_path):
        # P={1,3}, C={2,4}: ECDF gaps at v=1: |1/2-0|=.5; v=2: |.5-.5|=0;
        # v=3: |1-.5|=.5; v=4: 0 -> D=0.5, d_num = .5*4 = 2
        out = self._ks(spark, tmp_path, [1, 3], [2, 4])
        assert out["d_num"] == 2 and out["ks_d"] == 0.5

    def test_ties_counted_on_both_sides(self, spark, tmp_path):
        # shared value 5 contributes to BOTH cumulative counts at once
        out = self._ks(spark, tmp_path, [5, 6], [5, 9])
        # sorted: 5(P),5(C),6(P),9(C); at 5: |1*2-1*2|=0; at 6: |2*2-1*2|=2
        assert out["d_num"] == 2 and out["ks_d"] == 0.5


class TestMannWhitney:
    def _mw(self, spark, tmp_path, pvals, cvals):
        rows = []
        eid = 0
        for v in pvals:
            rows.append((eid, _ts(1), 1, "purchase", float(v), "{}"))
            eid += 1
        for v in cvals:
            rows.append((eid, _ts(1), 1, "click", float(v), "{}"))
            eid += 1
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r13_mannwhitney

        return r13_mannwhitney(spark, sf).collect()[0]

    def test_hand_computed_with_ties(self, spark, tmp_path):
        # P={1,2,2}, C={2,3}: pooled sorted 1,2,2,2,3 — midrank of the
        # three 2s is 3 (positions 2..4). R1 = 1+3+3 = 7,
        # U1 = 7 - 3*4/2 = 1; U2 = n1*n2 - U1 = 5
        out = self._mw(spark, tmp_path, [1, 2, 2], [2, 3])
        assert (out["n1"], out["n2"]) == (3, 2)
        assert out["u1_doubled"] == 2 and out["u2_doubled"] == 10
        assert out["auc"] == pytest.approx(1 / 6, abs=1e-6)

    def test_complete_separation(self, spark, tmp_path):
        # every purchase above every click -> U1 = n1*n2, AUC = 1
        out = self._mw(spark, tmp_path, [10, 11, 12], [1, 2])
        assert out["u1_doubled"] == 12 and out["auc"] == 1.0

    def test_identical_samples_auc_half(self, spark, tmp_path):
        out = self._mw(spark, tmp_path, [1, 2, 3], [1, 2, 3])
        assert out["u1_doubled"] == out["u2_doubled"]
        assert out["auc"] == 0.5


class TestMadOutliers:
    def test_hand_computed(self, spark, tmp_path):
        # values 1..9 plus an outlier 100: median of 1..9,100 = 5.5,
        # adevs = 4.5,3.5,...,0.5,0.5,...,94.5 -> MAD = 2.5;
        # threshold 7.5 -> only 100 (adev 94.5) and 1? adev(1)=4.5 no.
        vals = list(range(1, 10)) + [100]
        rows = [
            (i, _ts(1), 1, "view", float(v), "{}") for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r14_mad_outliers

        out = {r["event_type"]: r for r in r14_mad_outliers(spark, sf).collect()}
        v = out["view"]
        assert v["cnt"] == 10
        assert v["med"] == 5.5 and v["mad"] == 2.5
        assert v["n_outliers"] == 1

    def test_threshold_margin_on_real_data(self):
        """No |v-med| sits near its 3*MAD boundary at either SF — the
        one float comparison in the query."""
        import duckdb

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            worst = duckdb.sql(
                f"""
                WITH med AS (
                    SELECT event_type, median(CAST(value AS DOUBLE)) AS med
                    FROM read_parquet('{sf}/events.parquet')
                    WHERE value IS NOT NULL GROUP BY 1
                ),
                dev AS (
                    SELECT e.event_type,
                           abs(CAST(e.value AS DOUBLE) - m.med) AS adev
                    FROM read_parquet('{sf}/events.parquet') e
                    JOIN med m USING (event_type) WHERE e.value IS NOT NULL
                ),
                mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
                SELECT MIN(ABS(d.adev - 3 * m.mad))
                FROM dev d JOIN mad m USING (event_type)
                """
            ).fetchone()[0]
            assert worst > 1e-6, (sf, worst)


class TestKlDivergence:
    def test_uniform_source_matches_corpus(self, spark, tmp_path):
        # two sources with IDENTICAL word distributions -> KL = 0 both
        rows = [
            (1, "a b c d", "en", "src0", 7),
            (2, "a b c d", "en", "src1", 7),
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        from batch_processing_system_spark.queries.wrangling import r15_kl_divergence

        out = {r["source"]: r for r in r15_kl_divergence(spark, str(tmp_path)).collect()}
        assert out["src0"]["kl"] == 0.0 and out["src1"]["kl"] == 0.0
        assert out["src0"]["n_tokens"] == 4

    def test_skewed_source_positive(self, spark, tmp_path):
        import math

        rows = [
            (1, "a a a a", "en", "skew", 7),   # p(a)=1
            (2, "a b b b", "en", "base", 7),   # corpus: a=5/8, b=3/8
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        from batch_processing_system_spark.queries.wrangling import r15_kl_divergence

        out = {r["source"]: r["kl"] for r in r15_kl_divergence(spark, str(tmp_path)).collect()}
        # KL(skew) = 1 * ln(1 / (5/8)) = ln(8/5)
        assert out["skew"] == pytest.approx(round(math.log(8 / 5), 6), abs=2e-6)
        # KL(base) = 1/4 ln((1/4)/(5/8)) + 3/4 ln((3/4)/(3/8))
        want = 0.25 * math.log(0.25 / 0.625) + 0.75 * math.log(2.0)
        assert out["base"] == pytest.approx(round(want, 6), abs=2e-6)

    def test_rounding_margin_on_real_data(self):
        import duckdb

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            rows = duckdb.sql(
                f"""
                WITH t AS (
                    SELECT source, unnest(string_split(text, ' ')) AS word
                    FROM read_parquet('{sf}/documents.parquet')
                ),
                sw AS (SELECT source, word, COUNT(*) AS c FROM t
                       WHERE word <> '' GROUP BY 1, 2),
                s AS (SELECT source, SUM(c) AS ns FROM sw GROUP BY 1),
                w AS (SELECT word, SUM(c) AS cw FROM sw GROUP BY 1),
                g AS (SELECT SUM(c) AS n FROM sw)
                SELECT SUM((CAST(sw.c AS DOUBLE)/s.ns)
                        * ln((CAST(sw.c AS DOUBLE)/s.ns)/(CAST(w.cw AS DOUBLE)/g.n)))
                FROM sw JOIN s USING (source) JOIN w USING (word) CROSS JOIN g
                GROUP BY sw.source
                """
            ).fetchall()
            for (v,) in rows:
                margin = abs(v * 10**6 - round(v * 10**6) - 0.5)
                assert margin > 1e-4, (sf, v, margin)


class TestMarketBasket:
    def _li(self, spark, tmp_path, baskets):
        rows = []
        ln = 0
        for okey, parts in baskets:
            for i, p in enumerate(parts):
                rows.append((okey, p, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1)))
                ln += 1
        spark.createDataFrame(
            rows,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        return str(tmp_path)

    def test_hand_computed_rule(self, spark, tmp_path):
        # parts 1,2 co-occur in orders 10,11,12 (supp 3); part 1 also in
        # 13, part 2 also in 14,15 -> c1=4, c2=5, n_orders=6
        baskets = [
            (10, [1, 2]), (11, [1, 2]), (12, [1, 2]),
            (13, [1]), (14, [2]), (15, [2, 3]),
        ]
        from batch_processing_system_spark.queries.wrangling import r16_market_basket

        out = r16_market_basket(spark, self._li(spark, tmp_path, baskets)).collect()
        assert len(out) == 1  # only (1,2) reaches support 3
        r = out[0]
        assert (r["pa"], r["pb"], r["supp"]) == (1, 2, 3)
        assert r["conf_a_b"] == 0.75          # 3/4
        assert r["conf_b_a"] == 0.6           # 3/5
        assert r["lift"] == pytest.approx(3 * 6 / (4 * 5), abs=1e-9)

    def test_duplicate_lineitems_count_once(self, spark, tmp_path):
        # same part twice in one order must not inflate support
        baskets = [(1, [7, 7, 8]), (2, [7, 8]), (3, [7, 8])]
        from batch_processing_system_spark.queries.wrangling import r16_market_basket

        out = r16_market_basket(spark, self._li(spark, tmp_path, baskets)).collect()
        assert len(out) == 1 and out[0]["supp"] == 3

    def test_boundary_rational_justifies_unrounded_output(self):
        """The reason r16 emits raw ratios: this data contains a lift
        landing EXACTLY on the 4dp rounding half-boundary (44229/800 =
        55.28625), where ROUND across engines is the hazard and plain
        IEEE division of identical integer operands is not."""
        import duckdb

        rows = duckdb.sql(
            """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')),
            n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
            pc AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
            pairs AS (SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*) supp
                      FROM li a JOIN li b ON a.l_orderkey=b.l_orderkey
                        AND a.l_partkey<b.l_partkey
                      GROUP BY 1,2 HAVING COUNT(*) >= 3)
            SELECT supp * n.n_orders AS num, ca.c * cb.c AS den
            FROM pairs JOIN pc ca ON pa=ca.l_partkey
            JOIN pc cb ON pb=cb.l_partkey CROSS JOIN n
            """
        ).fetchall()
        # at least one lift is an exact x.xxxx5 rational — the case that
        # would make ROUND(.,4) engine-dependent
        assert any((num * 10**4 * 2) % (2 * den) == den for num, den in rows)
        # and every operand is exactly double-representable (< 2^53)
        assert all(num < 2**53 and den < 2**53 for num, den in rows)


class TestContainment:
    def test_quote_inclusion_detected_asymmetrically(self, spark, tmp_path):
        short = "alpha beta gamma delta epsilon zeta"  # 6 words, 2 shingles
        longdoc = (
            "intro words here then "  # 4
            + short
            + " plus a very long tail of unrelated content going on and on "
            "with many more words than the quoted fragment itself has"
        )
        rows = [
            (1, short, "en", "s", len(short)),
            (2, longdoc, "en", "s", len(longdoc)),
            (3, "completely different text with no shared runs at all here", "en", "s", 50),
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        from batch_processing_system_spark.queries.wrangling import r17_containment

        out = [
            (r["contained_id"], r["container_id"])
            for r in r17_containment(spark, str(tmp_path)).collect()
        ]
        assert out == [(1, 2)]  # 1 ⊂ 2, never the reverse, doc 3 clean

    def test_jaccard_would_miss_it(self, spark, tmp_path):
        """The planted pair above sits well below Jaccard 0.6 — the
        point of the asymmetric predicate."""
        short = "alpha beta gamma delta epsilon zeta"
        longdoc = (
            "intro words here then " + short
            + " plus a very long tail of unrelated content going on and on "
            "with many more words than the quoted fragment itself has"
        )
        sw = set()
        lw = set()
        for text, acc in ((short, sw), (longdoc, lw)):
            ws = text.split()
            for i in range(len(ws) - 4):
                acc.add(" ".join(ws[i : i + 5]))
        jac = len(sw & lw) / len(sw | lw)
        assert jac < 0.6
        assert len(sw & lw) >= 0.9 * len(sw)


class TestTriangles:
    def test_planted_triangle(self, spark, tmp_path):
        # orders making edges (1,2),(2,3),(1,3) [triangle] + (3,4)
        # each pair needs >= 2 shared orders to become an edge
        baskets = [
            (10, [1, 2, 3]), (11, [1, 2, 3]),  # edges 1-2, 2-3, 1-3 x2
            (12, [3, 4]), (13, [3, 4]),        # edge 3-4
            (14, [4, 5]),                      # below support, no edge
        ]
        rows = []
        for okey, parts in baskets:
            for i, p in enumerate(parts):
                rows.append((okey, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts(1)))
        spark.createDataFrame(
            rows,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        from batch_processing_system_spark.queries.wrangling import r18_triangles

        out = r18_triangles(spark, str(tmp_path)).collect()[0]
        assert (out["n_nodes"], out["n_edges"], out["n_triangles"]) == (4, 4, 1)


class TestIntervalMerge:
    def test_nested_interval_handled(self, spark, tmp_path):
        """The case lag(e)-based merging gets wrong: a short interval
        fully nested in an earlier longer one, followed by one that
        overlaps the LONG one but not the nested one."""
        base = _ts(1)

        def at(minutes):
            return base + dt.timedelta(minutes=minutes)

        rows = [
            (1, at(0), 1, "view", 0.0, "{}"),    # [0, 30)
            (2, at(5), 1, "view", 0.0, "{}"),    # [5, 35) overlaps
            (3, at(40), 1, "view", 0.0, "{}"),   # [40, 70) new island
            (4, at(200), 2, "view", 0.0, "{}"),  # other user
        ]
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r19_interval_merge

        out = {r["user_id"]: r for r in r19_interval_merge(spark, sf).collect()}
        assert out[1]["n_intervals"] == 2
        assert out[1]["covered_us"] == (35 + 30) * 60 * 10**6
        assert out[2]["n_intervals"] == 1
        assert out[2]["covered_us"] == 30 * 60 * 10**6

    def test_chain_merges_transitively(self, spark, tmp_path):
        base = _ts(2)

        def at(minutes):
            return base + dt.timedelta(minutes=minutes)

        # each 30-min interval starts 20 min after the previous: one island
        rows = [
            (i, at(20 * i), 7, "view", 0.0, "{}") for i in range(5)
        ]
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import r19_interval_merge

        out = r19_interval_merge(spark, sf).collect()[0]
        assert out["n_intervals"] == 1
        assert out["covered_us"] == (20 * 4 + 30) * 60 * 10**6


class TestLabelCentroids:
    def test_hand_computed(self, spark, tmp_path):
        rows = [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 6.0], 0),
            (3, [10.0, 0.5], 1),
        ]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        from batch_processing_system_spark.queries.wrangling import r20_label_centroids

        out = {
            (r["label"], r["dim"]): r
            for r in r20_label_centroids(spark, str(tmp_path)).collect()
        }
        assert out[(0, 0)]["centroid"] == 2.0 and out[(0, 0)]["n"] == 2
        assert out[(0, 1)]["centroid"] == 4.0
        assert out[(1, 0)]["centroid"] == 10.0
        assert out[(1, 1)]["centroid"] == 0.5


class TestGroupedRegression:
    def test_perfect_line_recovered(self, spark, tmp_path):
        # y = 2*x_seconds + 5 exactly -> slope_per_day = 2*86400
        base = _ts(1)
        rows = []
        for i in range(6):
            x_s = 600 * i
            rows.append(
                (i, base + dt.timedelta(seconds=x_s), 1, "view",
                 2.0 * x_s + 5.0, "{}")
            )
        sf = _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.wrangling import (
            r21_grouped_regression,
        )

        out = r21_grouped_regression(spark, sf).collect()[0]
        assert out["n"] == 6
        assert out["slope_per_day"] == pytest.approx(2.0 * 86400, abs=1e-4)
        assert out["intercept"] == pytest.approx(5.0, abs=1e-6)

    def test_rounding_margins_on_real_data(self):
        import duckdb

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            rows = duckdb.sql(
                f"""
                WITH m AS (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS mn
                           FROM read_parquet('{sf}/events.parquet')),
                e AS (
                    SELECT event_type,
                           CAST(epoch_us(CAST(ts AS TIMESTAMP)) - m.mn AS DOUBLE)
                               / 1000000.0 AS x,
                           CAST(value AS DOUBLE) AS y
                    FROM read_parquet('{sf}/events.parquet'), m
                    WHERE value IS NOT NULL
                ),
                s AS (SELECT event_type, COUNT(*) n, SUM(x) sx, SUM(y) sy,
                             SUM(x*x) sxx, SUM(x*y) sxy FROM e GROUP BY 1)
                SELECT 86400.0 * (n*sxy - sx*sy) / (n*sxx - sx*sx) AS spd,
                       (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS icp
                FROM s
                """
            ).fetchall()
            for spd, icp in rows:
                for v in (spd, icp):
                    margin = abs(v * 10**6 - round(v * 10**6) - 0.5)
                    assert margin > 1e-4, (sf, v, margin)


class TestJaroWinkler:
    def test_textbook_values(self):
        from batch_processing_system_spark.functions.fuzzy import jaro_winkler

        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111, abs=1e-9)
        assert jaro_winkler("dwayne", "duane") == pytest.approx(0.84, abs=1e-9)
        assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333, abs=1e-9)
        assert jaro_winkler("same", "same") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0
        assert jaro_winkler("", "x") == 0.0

    def test_parity_with_duckdb_on_random_strings(self):
        """The repo's pure-Python JW and DuckDB's C++ one must agree to
        double precision — the cross-implementation check r22's oracle
        relies on, exercised beyond the part-name vocabulary."""
        import itertools
        import random
        import string

        import duckdb

        from batch_processing_system_spark.functions.fuzzy import jaro_winkler

        rng = random.Random(7)
        words = [
            "".join(rng.choice(string.ascii_lowercase[:6]) for _ in range(rng.randint(0, 9)))
            for _ in range(40)
        ]
        for a, b in itertools.combinations(words, 2):
            duck = duckdb.sql(
                "select jaro_winkler_similarity(?, ?)", params=[a, b]
            ).fetchone()[0]
            assert jaro_winkler(a, b) == pytest.approx(duck, abs=1e-12), (a, b)

    def test_threshold_margin(self):
        """A pair scores EXACTLY 0.8 in this data — the reason r22's
        threshold is 0.815; pin that the chosen threshold keeps a real
        margin at both SFs."""
        import duckdb

        from batch_processing_system_spark.queries.wrangling import _JW_THRESHOLD

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            m = duckdb.sql(
                f"""
                WITH vocab AS (SELECT DISTINCT p_name,
                        regexp_extract(p_name,'[^ ]+$') blk
                    FROM read_parquet('{sf}/part.parquet'))
                SELECT MIN(ABS(jaro_winkler_similarity(a.p_name, b.p_name)
                               - {_JW_THRESHOLD}))
                FROM vocab a JOIN vocab b
                  ON a.blk = b.blk AND a.p_name < b.p_name
                """
            ).fetchone()[0]
            assert m > 1e-3, (sf, m)


class TestPercentileMargins:
    def test_rounding_margin_at_sf001(self, spark):
        """The 4dp ROUND is only hash-safe if no true percentile sits
        within double-noise of a .00005 boundary (q89's margin
        pattern). Measure the worst margin on the real sf0.001 table."""
        import duckdb

        rows = duckdb.sql(
            """
            SELECT quantile_cont(CAST(value AS DOUBLE), 0.5),
                   quantile_cont(CAST(value AS DOUBLE), 0.9),
                   quantile_cont(CAST(value AS DOUBLE), 0.99)
            FROM read_parquet('/root/testdata/sf0.001/events.parquet')
            GROUP BY event_type
            """
        ).fetchall()
        vals = [v for row in rows for v in row]
        worst = min(abs(v * 10**4 - round(v * 10**4) - 0.5) for v in vals)
        # distance of scaled value to the nearest x.5 rounding boundary;
        # anything >> 1e-9 dwarfs cross-engine lerp noise (~1e-12 scaled)
        assert worst > 1e-6


class TestEwma:
    def test_hand_computed_series(self, spark, tmp_path):
        # user 1: days 1,2,3 with counts 4, 8, 1:
        #   y = 4 -> 0.5*4+0.5*8 = 6 -> 0.5*6+0.5*1 = 3.5
        # user 2: single day, count 2 -> ewma = 2.0 (init = first)
        rows = []
        eid = 0
        for day, n in [(1, 4), (2, 8), (3, 1)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, _ts(day), 1, "view", 1.0, "{}"))
        for _ in range(2):
            eid += 1
            rows.append((eid, _ts(5), 2, "view", 1.0, "{}"))
        from batch_processing_system_spark.queries.wrangling import r24_ewma

        sf = _write_events(spark, tmp_path, rows)
        got = {r["user_id"]: (r["n_days"], r["ewma"]) for r in r24_ewma(spark, sf).collect()}
        assert got == {1: (3, 3.5), 2: (1, 2.0)}

    def test_gap_days_are_skipped_not_zero_filled(self, spark, tmp_path):
        # days 1 and 10 with counts 2, 6: the 8-day gap contributes
        # nothing (EWMA over OBSERVED points) -> 0.5*2+0.5*6 = 4.0
        rows = [
            (1, _ts(1), 7, "view", 1.0, "{}"),
            (2, _ts(1, 1), 7, "view", 1.0, "{}"),
        ] + [(10 + i, _ts(10, i), 7, "view", 1.0, "{}") for i in range(6)]
        from batch_processing_system_spark.queries.wrangling import r24_ewma

        sf = _write_events(spark, tmp_path, rows)
        row = r24_ewma(spark, sf).collect()[0]
        assert (row["n_days"], row["ewma"]) == (2, 4.0)

    def test_fold_is_exact_dyadic(self, spark, tmp_path):
        # alpha = 0.5 keeps every intermediate a dyadic rational, so
        # the engine result must equal the pure-Python fold EXACTLY
        counts = [3, 1, 7, 2, 9, 5, 11, 6]
        rows = []
        eid = 0
        for day, n in enumerate(counts, start=1):
            for _ in range(n):
                eid += 1
                rows.append((eid, _ts(day), 1, "view", 1.0, "{}"))
        from batch_processing_system_spark.queries.wrangling import r24_ewma

        sf = _write_events(spark, tmp_path, rows)
        expect = float(counts[0])
        for x in counts[1:]:
            expect = 0.5 * expect + 0.5 * x
        assert r24_ewma(spark, sf).collect()[0]["ewma"] == expect


class TestSkyline:
    @staticmethod
    def _plant_parts(spark, tmp_path, rows):
        spark.createDataFrame(
            [
                (i + 1, f"part {i}", "B", "T", size, price)
                for i, (price, size) in enumerate(rows)
            ],
            "p_partkey bigint, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "part.parquet")
        )
        return str(tmp_path)

    @staticmethod
    def _brute_force(rows):
        """The NOT EXISTS dominance definition, verbatim."""
        out = []
        for i, (pi, si) in enumerate(rows):
            dominated = any(
                pb <= pi and sb >= si and (pb < pi or sb > si)
                for j, (pb, sb) in enumerate(rows)
                if j != i
            )
            if not dominated:
                out.append(i + 1)
        return sorted(out)

    def test_hand_planted_ties(self, spark, tmp_path):
        rows = [
            (10.0, 5),   # skyline
            (10.0, 5),   # duplicate pair: co-survives
            (10.0, 3),   # equal price, smaller size: dominated
            (20.0, 5),   # pricier, same size as a cheaper row: dominated
            (20.0, 9),   # skyline (bigger than anything cheaper)
            (30.0, 9),   # dominated by (20, 9)
            (5.0, 1),    # skyline (cheapest)
        ]
        from batch_processing_system_spark.queries.wrangling import r26_skyline

        sf = self._plant_parts(spark, tmp_path, rows)
        got = sorted(r["p_partkey"] for r in r26_skyline(spark, sf).collect())
        assert got == self._brute_force(rows) == [1, 2, 5, 7]

    def test_random_matches_brute_force(self, spark, tmp_path):
        import random

        rng = random.Random(23)
        rows = [
            (float(rng.randrange(1, 40)), rng.randrange(1, 12))
            for _ in range(120)
        ]
        from batch_processing_system_spark.queries.wrangling import r26_skyline

        sf = self._plant_parts(spark, tmp_path, rows)
        got = sorted(r["p_partkey"] for r in r26_skyline(spark, sf).collect())
        assert got == self._brute_force(rows)


class TestProration:
    def test_hand_computed_allocation(self, spark, tmp_path):
        # one order, quantities 1,1,1 over 10000 points: floor 3333
        # each, deficit 1 -> all rems equal (tie), lowest linenumber
        # gets the extra point
        rows = [(1, 1, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts(1)) for i in (1, 2, 3)]
        # second order: quantities 2,1 -> 6666/3333 floors, rems
        # 20000%3=2 vs 10000%3=1 -> line 1 (q=2) takes the point
        rows += [
            (2, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", _ts(1)),
            (2, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts(1)),
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        from batch_processing_system_spark.queries.wrangling import r27_proration

        got = {
            (r["l_orderkey"], r["l_linenumber"]): r["alloc"]
            for r in r27_proration(spark, str(tmp_path)).collect()
        }
        assert got == {
            (1, 1): 3334, (1, 2): 3333, (1, 3): 3333,
            (2, 1): 6667, (2, 2): 3333,
        }

    def test_every_order_sums_exactly_on_real_data(self, spark):
        from batch_processing_system_spark.queries.wrangling import (
            _ALLOC_POINTS,
            r27_proration,
        )
        from pyspark.sql import functions as F

        sums = (
            r27_proration(spark, SF_SMALL)
            .groupBy("l_orderkey")
            .agg(F.sum("alloc").alias("s"))
            .where(F.col("s") != _ALLOC_POINTS)
            .count()
        )
        assert sums == 0


class TestHistogram:
    def test_clamps_and_boundaries(self, spark, tmp_path):
        vals = [-3.0, 0.0, 4.999, 5.0, 9.99, 97.0, 100.0, 5000.0]
        rows = [
            (i, _ts(1), 1, "view", v, "{}") for i, v in enumerate(vals)
        ]
        from batch_processing_system_spark.queries.wrangling import r28_histogram

        sf = _write_events(spark, tmp_path, rows)
        got = {
            (r["event_type"], r["bucket"]): r["n"]
            for r in r28_histogram(spark, sf).collect()
        }
        assert got == {
            ("view", 0): 3,   # -3 clamps, 0.0 and 4.999 in [0,5)
            ("view", 1): 2,   # 5.0 lands in bucket 1 exactly, 9.99
            ("view", 19): 3,  # 97 in [95,100) AND 100/5000 clamp to 19
        }


class TestRiAudit:
    def test_clean_data_reports_zero_orphans(self, spark):
        from batch_processing_system_spark.queries.wrangling import r29_ri_audit

        rows = r29_ri_audit(spark, SF_SMALL).collect()
        assert len(rows) == 5
        assert all(r["orphans"] == 0 for r in rows)
        assert all(r["fact_rows"] > 0 for r in rows)

    def test_broken_edge_fires(self, spark, tmp_path):
        import shutil as _sh

        from pyspark.sql import functions as F

        # copy the small SF files, then drop half the orders rows
        for t in ("lineitem", "orders", "customer", "part", "supplier", "nation"):
            _sh.copy(
                f"{SF_SMALL}/{t}.parquet", str(tmp_path / f"{t}.parquet")
            )
        orders = spark.read.parquet(str(tmp_path / "orders.parquet"))
        kept = orders.where(F.col("o_orderkey") % 2 == 0)
        kept = kept.localCheckpoint(eager=True)
        (tmp_path / "orders.parquet").unlink()
        kept.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        from batch_processing_system_spark.queries.wrangling import r29_ri_audit

        rows = {
            r["fk_edge"]: r["orphans"]
            for r in r29_ri_audit(spark, str(tmp_path)).collect()
        }
        assert rows["lineitem.l_orderkey->orders"] > 0
        assert rows["lineitem.l_partkey->part"] == 0
