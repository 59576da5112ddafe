"""r54 seasonal decomposition and r55 cohort LTV semantics: a planted
weekly pattern is recovered, edge weeks are excluded, LTV curves are
monotone and converge to each cohort's total revenue."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.temporal import (
    r54_seasonal,
    r55_cohort_ltv,
)
from tests.conftest import SF_SMALL


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


class TestSeasonal:
    def test_planted_weekly_pattern_recovered(self, spark, tmp_path):
        # 28 days of events: Mondays get 8 events/day, all other days 1.
        # The centered 7-day MA is constant at 2 on full weeks, so the
        # seasonal component must be +6 for Monday, -1 elsewhere.
        base = datetime.date(2024, 1, 1)  # a Monday
        rows = []
        eid = 0
        for day in range(28):
            d = base + datetime.timedelta(days=day)
            n = 8 if d.weekday() == 0 else 1
            for j in range(n):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(d.year, d.month, d.day, 12, 0, j),
                     1, "click", 1.0, "{}")
                )
        _write_events(spark, tmp_path, rows)
        got = {
            r["weekday"]: (r["seasonal"], r["n_days"])
            for r in r54_seasonal(spark, str(tmp_path)).collect()
        }
        # Spark dayofweek: Sunday=1 ... Monday=2
        for wd, (seasonal, _n) in got.items():
            assert seasonal == (6.0 if wd == 2 else -1.0), (wd, seasonal)

    def test_edge_weeks_excluded(self, spark, tmp_path):
        # only 5 days of data -> no position has a full 7-day window
        base = datetime.date(2024, 3, 4)
        rows = [
            (i + 1,
             datetime.datetime.combine(
                 base + datetime.timedelta(days=i), datetime.time(9)),
             1, "click", 1.0, "{}")
            for i in range(5)
        ]
        _write_events(spark, tmp_path, rows)
        assert r54_seasonal(spark, str(tmp_path)).count() == 0

    def test_4dp_margins_on_real_data(self, spark):
        for r in r54_seasonal(spark, SF_SMALL).collect():
            frac = (abs(r["seasonal"]) * 10**4) % 1.0
            assert abs(frac - 0.5) > 1e-6, r


class TestCohortLtv:
    def test_curves_monotone_and_total(self, spark):
        rows = r55_cohort_ltv(spark, SF_SMALL).collect()
        curves: dict = {}
        for r in rows:
            curves.setdefault(r["cohort_day"], []).append(
                (r["age"], r["cum_revenue"])
            )
        events = load_table(spark, SF_SMALL, "events")
        totals = {
            r["cohort_day"]: r["total"]
            for r in (
                events.withColumn(
                    "d", F.to_date(F.date_trunc("day", F.col("ts")))
                )
                .withColumn(
                    "cohort_day",
                    F.min("d").over(
                        __import__("pyspark.sql.window", fromlist=["Window"])
                        .Window.partitionBy("user_id")
                    ),
                )
                .where(
                    (F.col("event_type") == "purchase")
                    & F.col("value").isNotNull()
                )
                .groupBy("cohort_day")
                .agg(
                    F.sum(F.col("value").cast("decimal(12,2)"))
                    .cast("double")
                    .alias("total")
                )
                .collect()
            )
        }
        assert curves
        for cohort, pts in curves.items():
            pts.sort()
            vals = [v for _, v in pts]
            assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:])), cohort
            expected = totals.get(cohort, 0.0)
            assert abs(vals[-1] - expected) < 1e-6, (cohort, vals[-1], expected)


class TestAutocorrelation:
    def test_planted_weekly_cycle_peaks_at_lag_7(self, spark, tmp_path):
        # strict 7-day cycle in daily counts -> ACF(7) must dominate
        # every other lag and sit near +1
        base = datetime.date(2024, 1, 1)
        pattern = [10, 1, 1, 1, 1, 1, 1]
        rows = []
        eid = 0
        for day in range(35):
            d = base + datetime.timedelta(days=day)
            for j in range(pattern[day % 7]):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(d.year, d.month, d.day, 8, 0, j),
                     1, "click", 1.0, "{}")
                )
        _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.temporal import (
            r61_autocorrelation,
        )

        got = {
            r["lag"]: r["acf"]
            for r in r61_autocorrelation(spark, str(tmp_path)).collect()
        }
        # truncated-sum estimator: numerator has n-k terms over the
        # full-n denominator, so a perfect 7-cycle gives EXACTLY
        # (n-7)/n = 28/35 = 0.8 at lag 7
        assert got[7] == 0.8
        assert all(got[7] > got[k] + 0.5 for k in range(1, 7))

    def test_reference_formula(self, spark):
        # independent recomputation from the daily counts at sf0.001
        from batch_processing_system_spark.engine.io import load_table
        from batch_processing_system_spark.queries.temporal import (
            r61_autocorrelation,
        )

        events = load_table(spark, SF_SMALL, "events")
        daily = {}
        for r in events.select(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        ).collect():
            daily.setdefault(r["event_type"], {}).setdefault(r["d"], 0)
            daily[r["event_type"]][r["d"]] += 1
        expect = {}
        for t, m in daily.items():
            days = sorted(m)
            cnts = [m[d] for d in days]
            n, s = len(cnts), sum(cnts)
            c = [n * x - s for x in cnts]
            den = sum(v * v for v in c)
            for k in range(1, 8):
                if len(c) > k:
                    num = sum(c[i] * c[i + k] for i in range(len(c) - k))
                    expect[(t, k)] = round(num / den, 4)
        got = {
            (r["event_type"], r["lag"]): r["acf"]
            for r in r61_autocorrelation(spark, SF_SMALL).collect()
        }
        assert set(got) == set(expect)
        for key in got:
            assert abs(got[key] - expect[key]) < 2e-4, key


class TestCrossCorrelation:
    def test_planted_lead_detected(self, spark, tmp_path):
        # clicks spike on day d, purchases spike on day d+2 -> the CCF
        # must peak at lag +2 (clicks lead by 2 days)
        base = datetime.date(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(28):
            d = base + datetime.timedelta(days=day)
            n_click = 9 if day % 7 == 0 else 1
            n_purch = 9 if day % 7 == 2 else 1
            for j in range(n_click):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(d.year, d.month, d.day, 8, 0, j),
                     1, "click", 1.0, "{}")
                )
            for j in range(n_purch):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(d.year, d.month, d.day, 9, 0, j),
                     1, "purchase", 2.0, "{}")
                )
        _write_events(spark, tmp_path, rows)
        from batch_processing_system_spark.queries.temporal import (
            r62_crosscorrelation,
        )

        got = {
            r["lag"]: r["ccf"]
            for r in r62_crosscorrelation(spark, str(tmp_path)).collect()
        }
        assert set(got) == set(range(-3, 4))
        assert max(got, key=got.get) == 2
        assert got[2] > 0.5
