"""Hypothesis property tests for the r-block temporal operators:
random event logs are run through the Spark queries AND independent
pure-Python reference implementations, and must agree exactly.
Complements the planted corner cases in test_wrangling.py and the
DuckDB oracles (which share SQL semantics; these references share
nothing but the spec)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import given, settings

from tests.conftest import prop_examples
from hypothesis import strategies as st

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

BASE = dt.datetime(2024, 3, 1)

# random small event logs: a few users, minute-resolution offsets over
# ~10 days, 5 event types, 2-decimal values
events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),                # user_id
        st.integers(0, 10 * 24 * 60),     # minutes offset
        st.sampled_from(["signup", "view", "click", "purchase", "error"]),
        st.integers(0, 99999),            # value in cents
    ),
    min_size=1,
    max_size=40,
)


def _mk_rows(raw):
    rows = []
    for eid, (user, minutes, etype, cents) in enumerate(raw):
        rows.append(
            (
                eid,
                BASE + dt.timedelta(minutes=minutes),
                user,
                etype,
                cents / 100.0,
                "{}",
            )
        )
    return rows


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestGapfillProperty:
    @staticmethod
    def _reference(rows):
        daily = defaultdict(float)
        for eid, ts, user, etype, value, _ in rows:
            # emulate DECIMAL(18,2) accumulation with integer cents
            daily[(user, ts.date())] += round(value * 100)
        out = {}
        by_user = defaultdict(list)
        for (user, day), cents in daily.items():
            by_user[user].append(day)
        for user, days in by_user.items():
            cur = None
            d = min(days)
            while d <= max(days):
                if (user, d) in daily:
                    cur = daily[(user, d)] / 100.0
                    out[(user, d)] = (cur, True)
                else:
                    out[(user, d)] = (cur, False)
                d += dt.timedelta(days=1)
        return out

    @given(raw=events_strategy)
    @settings(max_examples=prop_examples(12), deadline=None)
    def test_matches_reference(self, spark, tmp_path_factory, raw):
        from batch_processing_system_spark.queries.wrangling import r01_gapfill

        rows = _mk_rows(raw)
        sf = _write(spark, tmp_path_factory.mktemp("gp"), rows)
        got = {
            (r["user_id"], r["day"]): (r["value_ff"], r["observed"])
            for r in r01_gapfill(spark, sf).collect()
        }
        assert got == self._reference(rows)


class TestScd2Property:
    @staticmethod
    def _reference(rows):
        per_user = defaultdict(list)
        for eid, ts, user, etype, _, _ in rows:
            eu = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 10**6)
            per_user[user].append((eu, eid, etype))
        out = set()
        for user, evs in per_user.items():
            evs.sort()
            changes = []
            prev = None
            for eu, eid, etype in evs:
                if etype != prev:
                    changes.append((eu, etype))
                    prev = etype
            for i, (eu, etype) in enumerate(changes):
                nxt = changes[i + 1][0] if i + 1 < len(changes) else None
                out.add((user, etype, eu, nxt, nxt is None))
        return out

    @given(raw=events_strategy)
    @settings(max_examples=prop_examples(12), deadline=None)
    def test_matches_reference(self, spark, tmp_path_factory, raw):
        from batch_processing_system_spark.queries.wrangling import r04_scd2

        rows = _mk_rows(raw)
        sf = _write(spark, tmp_path_factory.mktemp("sc"), rows)
        got = {
            (r["user_id"], r["state"], r["valid_from_us"],
             r["valid_to_us"], r["is_current"])
            for r in r04_scd2(spark, sf).collect()
        }
        assert got == self._reference(rows)

    @given(raw=events_strategy)
    @settings(max_examples=prop_examples(12), deadline=None)
    def test_intervals_tile_the_timeline(self, spark, tmp_path_factory, raw):
        """Structural invariant: per user, intervals are disjoint,
        adjacent (each valid_to equals the next valid_from), and
        exactly one is open."""
        from batch_processing_system_spark.queries.wrangling import r04_scd2

        rows = _mk_rows(raw)
        sf = _write(spark, tmp_path_factory.mktemp("sc2"), rows)
        per_user = defaultdict(list)
        for r in r04_scd2(spark, sf).collect():
            per_user[r["user_id"]].append(r)
        for user, ivs in per_user.items():
            ivs.sort(key=lambda r: r["valid_from_us"])
            assert sum(1 for r in ivs if r["is_current"]) == 1
            assert ivs[-1]["is_current"] and ivs[-1]["valid_to_us"] is None
            for a, b in zip(ivs, ivs[1:]):
                assert a["valid_to_us"] == b["valid_from_us"]
                assert a["state"] != b["state"]


class TestAttributionProperty:
    @staticmethod
    def _reference(rows):
        per_user = defaultdict(list)
        for eid, ts, user, etype, _, _ in rows:
            eu = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 10**6)
            per_user[user].append((eu, eid, etype))
        out = {}
        for user, evs in per_user.items():
            evs.sort()
            last_touch = None  # (eid, etype, eu)
            for eu, eid, etype in evs:
                if etype == "purchase":
                    if last_touch is None:
                        out[eid] = (user, None, None, None)
                    else:
                        out[eid] = (
                            user, last_touch[0], last_touch[1],
                            eu - last_touch[2],
                        )
                if etype in ("click", "view"):
                    last_touch = (eid, etype, eu)
        return out

    @given(raw=events_strategy)
    @settings(max_examples=prop_examples(12), deadline=None)
    def test_matches_reference(self, spark, tmp_path_factory, raw):
        from batch_processing_system_spark.queries.wrangling import r06_attribution

        rows = _mk_rows(raw)
        sf = _write(spark, tmp_path_factory.mktemp("at"), rows)
        got = {
            r["purchase_id"]: (
                r["user_id"], r["touch_id"], r["touch_type"], r["gap_us"]
            )
            for r in r06_attribution(spark, sf).collect()
        }
        assert got == self._reference(rows)


class TestIntervalMergeProperty:
    @staticmethod
    def _reference(rows, length_us=1800 * 10**6):
        per_user = defaultdict(list)
        for eid, ts, user, etype, _, _ in rows:
            eu = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 10**6)
            per_user[user].append((eu, eu + length_us))
        out = {}
        for user, ivs in per_user.items():
            ivs.sort()
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            out[user] = (len(merged), sum(e - s for s, e in merged))
        return out

    @given(raw=events_strategy)
    @settings(max_examples=prop_examples(12), deadline=None)
    def test_matches_reference(self, spark, tmp_path_factory, raw):
        from batch_processing_system_spark.queries.wrangling import r19_interval_merge

        rows = _mk_rows(raw)
        sf = _write(spark, tmp_path_factory.mktemp("iv"), rows)
        got = {
            r["user_id"]: (r["n_intervals"], r["covered_us"])
            for r in r19_interval_merge(spark, sf).collect()
        }
        assert got == self._reference(rows)
