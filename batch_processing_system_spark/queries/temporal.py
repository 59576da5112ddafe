"""Temporal operators, batch equivalents (SURVEY §2.3 T4-T6).

The reference's only temporal machinery is a 5-minute poll cycle
(/root/reference/README.md:81,145) — incremental batch. These are the
EXT window operators a general engine needs; their true-streaming
counterparts (event-time windows + watermarks over readStream) live in
``batch_processing_system_spark/streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..engine.det import bcount, dsum
from ..engine.io import load_table
from . import register


@register(
    "q39",
    """
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_bucket,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="T4 tumbling window (batch equiv) — date_trunc bucket + hash agg; "
    "identical semantics to groupBy(window(ts, '1 hour')) in streaming.",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_bucket"), F.col("event_type")
        )
        .agg(bcount("cnt"), dsum("value", "sum_value"))
    )


@register(
    "q40",
    """
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
               LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_es
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM e GROUP BY user_id
    """,
    doc="T6 session window (batch equiv) — gaps-and-islands: lag + "
    "cumulative new-session flags, 30-min gap rule (SURVEY §7 H4: the "
    "same logic written once for both engines). Streaming counterpart: "
    "session_window(ts, '30 minutes').",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp("ts")
    flagged = events.select(
        "user_id",
        F.when(
            F.lag(es).over(w).isNull() | ((es - F.lag(es).over(w)) > 1800), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").cast("bigint").alias("n_sessions")
    )


# Shared with r77_streaming_funnel (queries/streamrows.py): the
# streaming replay twin is pinned to the SAME oracle, so batch ≡
# stream is checked by the driver gate itself, not just by pytest.
Q95_SQL = """
    WITH e AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        FROM events
    ),
    s1 AS (SELECT user_id, MIN(es) AS t1 FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(es) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'view' AND es > t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(es) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND es > t2 GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
           t1, t2, t3
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    """


@register(
    "q95_funnel",
    Q95_SQL,
    doc="Funnel analysis — per user, the deepest stage of the ordered "
    "sequence signup → view → purchase with STRICTLY increasing "
    "timestamps, plus each stage's entry time. Spark side: ONE shuffle "
    "(groupBy user) collecting the sorted event sequence, then a pure "
    "JVM higher-order F.aggregate automaton over it — no UDF, no "
    "self-joins. The oracle is the greedy min-chain (earliest signup, "
    "earliest later view, earliest later purchase), which the "
    "sequential automaton provably equals: greedy is exchange-optimal "
    "for subsequence existence, and both sides require strict '>' so "
    "same-second events cannot chain. Per-user arrays are bounded by "
    "per-user event count (the q22 caveat applies at extreme skew — "
    "cap or pre-filter event types at 100 TB; the type filter below "
    "already drops irrelevant rows before the shuffle).",
)
def q95_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stages = ("signup", "view", "purchase")
    evs = events.filter(F.col("event_type").isin(*stages)).select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        "event_type",
    )
    # all users appear in the output, even those with no funnel events
    users = events.select("user_id").distinct()
    seq = evs.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("es", "event_id", "event_type"))).alias(
            "seq"
        )
    )
    bnull = F.lit(None).cast("bigint")
    state0 = F.struct(
        F.lit(0).cast("int").alias("stage"),
        bnull.alias("t1"),
        bnull.alias("t2"),
        bnull.alias("t3"),
    )

    def step(acc, ev):
        to1 = (acc["stage"] == 0) & (ev["event_type"] == "signup")
        to2 = (
            (acc["stage"] == 1)
            & (ev["event_type"] == "view")
            & (ev["es"] > acc["t1"])
        )
        to3 = (
            (acc["stage"] == 2)
            & (ev["event_type"] == "purchase")
            & (ev["es"] > acc["t2"])
        )
        return (
            F.when(
                to1,
                F.struct(
                    F.lit(1).cast("int").alias("stage"),
                    ev["es"].alias("t1"),
                    acc["t2"].alias("t2"),
                    acc["t3"].alias("t3"),
                ),
            )
            .when(
                to2,
                F.struct(
                    F.lit(2).cast("int").alias("stage"),
                    acc["t1"].alias("t1"),
                    ev["es"].alias("t2"),
                    acc["t3"].alias("t3"),
                ),
            )
            .when(
                to3,
                F.struct(
                    F.lit(3).cast("int").alias("stage"),
                    acc["t1"].alias("t1"),
                    acc["t2"].alias("t2"),
                    ev["es"].alias("t3"),
                ),
            )
            .otherwise(acc)
        )

    funnel = seq.select(
        "user_id", F.aggregate("seq", state0, step).alias("f")
    )
    return users.join(funnel, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("f.stage"), F.lit(0).cast("int")).alias("stage"),
        F.col("f.t1").alias("t1"),
        F.col("f.t2").alias("t2"),
        F.col("f.t3").alias("t3"),
    )


@register(
    "q96_retention",
    """
    WITH e AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        FROM events
    ),
    cohorts AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_day,
               date_diff('day', c.cohort_day, e.d) AS offset_days
        FROM e JOIN cohorts c USING (user_id)
    )
    SELECT cohort_day, CAST(offset_days AS BIGINT) AS offset_days,
           COUNT(*) AS n_users
    FROM activity WHERE offset_days <= 7
    GROUP BY 1, 2
    """,
    doc="Cohort retention — the second classic behavioral-analytics "
    "shape next to the funnel (q95): users cohorted by first-activity "
    "day, then for each day offset 0..7 the count of cohort members "
    "active that day. Two hash aggregations and one user-keyed join "
    "(the cohort map is user-sized — broadcastable against a 100 TB "
    "event log); distinct-per-day dedup rides the same shuffle. All "
    "outputs are DATE/BIGINT — nothing to round.",
)
def q96_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    )
    cohorts = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        e.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).alias("offset_days"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("offset_days") <= 7)
        .groupBy("cohort_day", F.col("offset_days").cast("bigint").alias("offset_days"))
        .agg(bcount("n_users"))
    )


@register(
    "q97_transitions",
    """
    WITH e AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS cnt
    FROM e WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Event transition matrix — the first-order Markov view of the "
    "clickstream: per user, each consecutive (event, next event) pair "
    "ordered by time (event_id tiebreak, D3), counted corpus-wide. "
    "One shuffle for the per-user window, one for the pair count; "
    "output is |event types|^2 rows regardless of data size. The "
    "companion diagnostic to the funnel (q95): the funnel asks 'did "
    "the ordered chain complete', this asks 'where do users actually "
    "go next'.",
)
def q97_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        e.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(bcount("cnt"))
    )


@register(
    "r54_seasonal",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    trended AS (
        SELECT event_type, d, cnt,
               SUM(cnt) OVER w AS sum7,
               COUNT(*) OVER w AS n7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detrended AS (
        SELECT event_type,
               CAST(dayofweek(d) + 1 AS INT) AS weekday,  -- DuckDB 0=Sun; Spark 1=Sun
               7 * cnt - sum7 AS scaled
        FROM trended WHERE n7 = 7
    )
    SELECT event_type, weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(scaled) AS DOUBLE) / (7 * COUNT(*)), 4)
               AS seasonal
    FROM detrended
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Seasonal decomposition (moving-average detrend) — the "
    "classic additive model's seasonal component: per event type, "
    "daily counts minus a centered 7-day moving-average trend, "
    "averaged by weekday. The detrend stays INTEGER the whole way — "
    "scaled = 7·cnt − Σ7 (cnt minus the trend, multiplied through by "
    "7) — so the only float op is ONE final division of exact "
    "integer sums, then ROUND 4dp; no per-row double ever enters an "
    "unordered aggregate (the r38/r12 cross-multiplication rule "
    "applied to time series). Edge weeks (incomplete 7-day windows) "
    "are excluded by the window row count, not by date arithmetic. "
    "One shuffle on event_type; windows partition per type.",
)
def r54_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "d",
        "cnt",
        F.sum("cnt").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    ).where(F.col("n7") == 7)
    detrended = trended.select(
        "event_type",
        F.dayofweek("d").cast("int").alias("weekday"),
        (7 * F.col("cnt") - F.col("sum7")).alias("scaled"),
    )
    return (
        detrended.groupBy("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum("scaled").cast("double")
                / (7 * F.count(F.lit(1))),
                4,
            ).alias("seasonal"),
        )
        .orderBy("event_type", "weekday")
    )


@register(
    "r55_cohort_ltv",
    """
    WITH e AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                    THEN CAST(value AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END AS rev,
               CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                    THEN 1 ELSE 0 END AS is_p
        FROM events
    ),
    cohorts AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id),
    aged AS (
        SELECT c.cohort_day,
               date_diff('day', c.cohort_day, e.d) AS age,
               e.rev, e.is_p
        FROM e JOIN cohorts c USING (user_id)
    ),
    per_age AS (
        SELECT cohort_day, CAST(age AS BIGINT) AS age,
               SUM(rev) AS day_rev,
               CAST(SUM(is_p) AS BIGINT) AS n_purch
        FROM aged GROUP BY 1, 2
    )
    SELECT cohort_day, age,
           n_purch,
           CAST(SUM(day_rev) OVER (PARTITION BY cohort_day ORDER BY age)
                AS DOUBLE) AS cum_revenue
    FROM per_age
    ORDER BY cohort_day, age
    """,
    doc="Cohort LTV curves — q96 retention's revenue twin: users "
    "cohorted by first-activity day, purchase revenue bucketed by "
    "cohort age, then the CUMULATIVE revenue curve per cohort. The "
    "running sum happens in DECIMAL (exact at any accumulation "
    "order) and converts to DOUBLE only at output, so the curve is "
    "hash-comparable with no margin analysis. Cohort map is "
    "user-sized (broadcastable against a 100 TB log); the cumulative "
    "window partitions per cohort — age-bounded, never global.",
)
def r55_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    is_p = (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    e = events.select(
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        F.when(is_p, F.col("value").cast("decimal(12,2)"))
        .otherwise(F.lit(0).cast("decimal(12,2)"))
        .alias("rev"),
        F.when(is_p, F.lit(1)).otherwise(F.lit(0)).alias("is_p"),
    )
    cohorts = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    aged = e.join(F.broadcast(cohorts), "user_id").select(
        "cohort_day",
        F.datediff(F.col("d"), F.col("cohort_day")).cast("bigint").alias("age"),
        "rev",
        "is_p",
    )
    per_age = aged.groupBy("cohort_day", "age").agg(
        F.sum("rev").alias("day_rev"),
        F.sum("is_p").cast("bigint").alias("n_purch"),
    )
    w = Window.partitionBy("cohort_day").orderBy("age")
    return (
        per_age.select(
            "cohort_day",
            "age",
            "n_purch",
            F.sum("day_rev").over(w).cast("double").alias("cum_revenue"),
        )
        .orderBy("cohort_day", "age")
    )


_ACF_MAXLAG = 7


@register(
    "r61_autocorrelation",
    f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s
        FROM daily GROUP BY 1
    ),
    centered AS (
        SELECT d.event_type, d.d,
               CAST(st.n * d.cnt - st.s AS DECIMAL(19,0)) AS c,
               st.n
        FROM daily d JOIN stats st USING (event_type)
    ),
    lagged AS (
        SELECT event_type, c,
               {", ".join(f"lead(c, {k}) OVER (PARTITION BY event_type ORDER BY d) AS c{k}" for k in range(1, _ACF_MAXLAG + 1))}
        FROM centered
    ),
    sums AS (
        SELECT event_type,
               SUM(c * c) AS den,
               {", ".join(f"SUM(c * c{k}) AS num{k}" for k in range(1, _ACF_MAXLAG + 1))}
        FROM lagged GROUP BY 1
    )
    SELECT event_type, CAST(lag AS INT) AS lag,
           ROUND(CAST(num AS DOUBLE) / den, 4) AS acf
    FROM (
        {" UNION ALL ".join(f"SELECT event_type, {k} AS lag, num{k} AS num, den FROM sums" for k in range(1, _ACF_MAXLAG + 1))}
    ) t
    WHERE num IS NOT NULL
    ORDER BY event_type, lag
    """,
    doc="Autocorrelation function of the daily count series (lags "
    "1..7, per event type) — r54's diagnostic companion: a weekly "
    "seasonality shows up as an ACF spike at lag 7. Exactness by the "
    "same cross-multiplication rule: centered values scale through "
    "n·x_t − Σx (INTEGER — no float mean ever exists), the lag "
    "products and both quadratic sums accumulate in DECIMAL(38,0) "
    "(exact for any int64 centered value — c² would silently wrap "
    "BIGINT at |c| ~ 3e9 in non-ANSI Spark), and the single "
    "float op is the final num/den division, ROUND 4dp. Lags via "
    "lead() over the per-type day order (one window partition per "
    "type, bounded by span days); truncated tails drop out as NULL "
    "products on both engines identically. One shuffle on "
    "event_type.",
)
def r61_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("s"),
    )
    # Centering stays BIGINT (headroom: n·cnt needs cnt·span_days <
    # 9.2e18 — ~1e13 events/day over 1e5 days); the QUADRATIC sums do
    # NOT have that headroom (c² wraps at |c| ~ 3e9), so c is cast to
    # DECIMAL(19,0) making c·c / c·c_k DECIMAL(38,0) — exact for any
    # int64 c, and an overflow surfaces as NULL/error instead of the
    # silent wrap non-ANSI Spark would give on BIGINT.
    centered = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        (F.col("n") * F.col("cnt") - F.col("s")).cast("decimal(19,0)").alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = centered.select(
        "event_type",
        "c",
        *[F.lead("c", k).over(w).alias(f"c{k}") for k in range(1, _ACF_MAXLAG + 1)],
    )
    sums = lagged.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("den"),
        *[
            F.sum(F.col("c") * F.col(f"c{k}")).alias(f"num{k}")
            for k in range(1, _ACF_MAXLAG + 1)
        ],
    )
    parts = [
        sums.select(
            "event_type",
            F.lit(k).cast("int").alias("lag"),
            F.col(f"num{k}").alias("num"),
            F.col("den").alias("den"),
        )
        for k in range(1, _ACF_MAXLAG + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return (
        out.where(F.col("num").isNotNull())
        .select(
            "event_type",
            "lag",
            F.round(F.col("num").cast("double") / F.col("den"), 4).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


_CCF_MAXLAG = 3
_CCF_A, _CCF_B = "click", "purchase"


@register(
    "r62_crosscorrelation",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CAST(COUNT(*) FILTER (event_type = '{_CCF_A}') AS BIGINT) AS ca,
               CAST(COUNT(*) FILTER (event_type = '{_CCF_B}') AS BIGINT) AS cb
        FROM events
        WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
        GROUP BY 1
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ca) AS BIGINT) AS sa,
               CAST(SUM(cb) AS BIGINT) AS sb
        FROM daily
    ),
    centered AS (
        SELECT d.d,
               CAST(st.n * d.ca - st.sa AS DECIMAL(19,0)) AS xa,
               CAST(st.n * d.cb - st.sb AS DECIMAL(19,0)) AS xb
        FROM daily d, stats st
    ),
    den AS (
        SELECT SUM(xa * xa) AS da, SUM(xb * xb) AS db FROM centered
    ),
    lagged AS (
        SELECT l.lag, SUM(p.xa * q.xb) AS num
        FROM (SELECT unnest(range(-{_CCF_MAXLAG}, {_CCF_MAXLAG + 1})) AS lag) l
        JOIN centered p ON TRUE
        JOIN centered q ON q.d = p.d + CAST(l.lag AS INT)
        GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag,
           ROUND(CAST(num AS DOUBLE)
                 / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)), 4) AS ccf
    FROM lagged, den
    ORDER BY lag
    """,
    doc=f"Cross-correlation between the '{_CCF_A}' and '{_CCF_B}' "
    "daily count series at lags −3..+3 — the lead/lag discovery view "
    "(a positive-lag peak means clicks LEAD purchases). Same "
    "integer-exact discipline as r61: both series center through "
    "n·x − Σx on the SHARED day calendar (one conditional aggregation "
    "builds both series — absent days are true zero counts), every "
    "product and both denominators accumulate in DECIMAL(38,0) "
    "(exact for any int64 centered value), and the only float "
    "ops are the final sqrt(da·db) and division — the identical IEEE "
    "pair on identical exact operands — then ROUND 4dp. The lag join "
    "is an equi-join on date_add (calendar-sized); one shuffle for "
    "the daily aggregation.",
)
def r62_crosscorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.where(F.col("event_type").isin(_CCF_A, _CCF_B))
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(
            F.count(F.when(F.col("event_type") == _CCF_A, 1))
            .cast("bigint")
            .alias("ca"),
            F.count(F.when(F.col("event_type") == _CCF_B, 1))
            .cast("bigint")
            .alias("cb"),
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ca").cast("bigint").alias("sa"),
        F.sum("cb").cast("bigint").alias("sb"),
    )
    # Same overflow posture as r61: centering in BIGINT (documented
    # headroom), quadratic sums in DECIMAL(38,0) via DECIMAL(19,0)
    # operands so xa·xb is exact for any int64 inputs on BOTH engines.
    centered = daily.join(F.broadcast(stats)).select(
        "d",
        (F.col("n") * F.col("ca") - F.col("sa")).cast("decimal(19,0)").alias("xa"),
        (F.col("n") * F.col("cb") - F.col("sb")).cast("decimal(19,0)").alias("xb"),
    ).localCheckpoint(eager=True)  # three consumers below
    den = centered.agg(
        F.sum(F.col("xa") * F.col("xa")).alias("da"),
        F.sum(F.col("xb") * F.col("xb")).alias("db"),
    )
    lags = spark.createDataFrame(
        [(k,) for k in range(-_CCF_MAXLAG, _CCF_MAXLAG + 1)], "lag int"
    )
    p = centered.select(F.col("d").alias("dp"), "xa")
    q = centered.select(F.col("d").alias("dq"), "xb")
    lagged = (
        p.crossJoin(F.broadcast(lags))
        .withColumn("dq", F.date_add(F.col("dp"), F.col("lag")))
        .join(q, "dq")
        .groupBy("lag")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("num"))
    )
    return (
        lagged.join(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.round(
                F.col("num").cast("double")
                / F.sqrt(F.col("da").cast("double") * F.col("db").cast("double")),
                4,
            ).alias("ccf"),
        )
        .orderBy("lag")
    )
