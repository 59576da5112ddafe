"""Coverage-completing operators: the SURVEY §2 capabilities not yet
exercised as standalone catalog queries — full W3 rank family, pivot,
EXISTS / scalar subqueries, ordered string aggregation, exact TF-IDF,
histogram bucketing, and the U3 batch grouped-map surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..engine.det import bcount
from ..engine.io import load_table
from . import register


@register(
    "q56_rank_family",
    """
    SELECT c_custkey,
           c_mktsegment,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey)
    """,
    doc="W3 complete rank family — rank/dense_rank/ntile over the same "
    "partitioned ordered window (deterministic: total order via the "
    "custkey tiebreak, §2.5 D3).",
)
def q56_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").cast("decimal(18,2)").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "q57_pivot",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
    doc="Pivot — long→wide per-user event-type counts via "
    "df.groupBy().pivot(values).count(): with the value list given "
    "explicitly, Catalyst plans a single-pass pivot aggregate (no "
    "second scan to discover values). Oracle spells the same thing as "
    "CASE sums.",
)
def q57_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    kinds = ["view", "click", "purchase", "signup", "error"]
    out = events.groupBy("user_id").pivot("event_type", kinds).count()
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(k) for k in kinds]
    )


@register(
    "q58_string_agg",
    """
    SELECT source,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
    FROM documents GROUP BY source
    """,
    doc="Ordered string aggregation (LISTAGG) — collect_set → array_sort "
    "→ array_join; sorted per §2.5 D8 so the concatenation is "
    "order-independent of partitioning.",
)
def q58_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs")
    )


@register(
    "q59_exists",
    """
    SELECT o_orderkey FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
    doc="EXISTS correlated subquery — decorrelates to a left-semi join "
    "on the correlation key with the predicate pushed below the join "
    "(same plan the DataFrame semi-join form produces).",
)
def q59_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey")


@register(
    "q60_scalar_subquery",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
          (SELECT ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))), 2) FROM orders)
    """,
    doc="Scalar subquery — orders above the global average price. The "
    "aggregate runs once and broadcasts as a literal into the filter "
    "(Spark: ScalarSubquery reuse, not a rescan per row). DECIMAL "
    "discipline keeps the threshold identical on both engines (D1).",
)
def q60_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price_d = F.col("o_totalprice").cast("decimal(18,2)")
    avg_price = orders.select(F.round(F.avg(price_d), 2).alias("a"))
    return (
        orders.join(F.broadcast(avg_price))
        .filter(price_d > F.col("a"))
        .select("o_orderkey", price_d.cast("double").alias("total_price"))
    )


@register(
    "q61_tfidf",
    """
    WITH words AS (
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> ''
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               ROUND(tf.tf * LN((n.n + 1.0) / (df.df + 1.0)), 4) AS tfidf
        FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf FROM (
        SELECT doc_id, word, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, word) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
    doc="X4 exact TF-IDF, top term per document (tier-1!) — term "
    "frequency ⋈ document frequency (broadcast: df is vocabulary-sized) "
    "with smoothed-idf weighting, rounded per D7, top-1 by window with "
    "word tiebreak. The hashed HashingTF+IDF pipeline replaces this "
    "when the vocabulary itself no longer fits (features become "
    "indices, scores tier-2).",
)
def q61_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-edge scalar, O(1) result
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(bcount("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 4
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "word", "tfidf")
    )


@register(
    "q67_scalar_breadth",
    """
    SELECT o_orderkey,
           GREATEST(CAST(o_totalprice AS DECIMAL(18,2)), CAST(100000 AS DECIMAL(18,2))) >
               CAST(100000 AS DECIMAL(18,2)) AS above_100k,
           LEAST(o_orderkey % 7, o_orderkey % 5) AS least_mod,
           LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
           CAST(datediff('day', CAST(o_orderdate AS TIMESTAMP),
                         TIMESTAMP '2024-06-01 00:00:00') AS BIGINT) AS days_to_cutoff,
           CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY) AS DATE)
               AS due_day
    FROM orders
    """,
    doc="C2-C4 breadth — greatest/least, lpad, date arithmetic "
    "(datediff + interval add): the long tail of scalar functions an "
    "engine user reaches for daily. All map-side expressions.",
)
def q67_scalar_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price_d = F.col("o_totalprice").cast("decimal(18,2)")
    cutoff = F.lit("2024-06-01 00:00:00").cast("timestamp")
    return o.select(
        "o_orderkey",
        (F.greatest(price_d, F.lit(100000).cast("decimal(18,2)"))
         > F.lit(100000).cast("decimal(18,2)")).alias("above_100k"),
        F.least(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).alias("least_mod"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.datediff(cutoff, F.col("o_orderdate")).cast("bigint").alias("days_to_cutoff"),
        F.to_date(F.date_trunc("day", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
        .alias("due_day"),
    )


@register(
    "q68_conditional_agg",
    """
    SELECT user_id,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
           bool_or(event_type = 'error') AS had_error,
           bool_and(value >= 0) AS all_nonneg,
           CAST(MIN(CASE WHEN event_type = 'purchase' THEN event_id END) AS BIGINT)
               AS first_purchase_id
    FROM events GROUP BY user_id
    """,
    doc="Conditional aggregation — count_if / bool_or / bool_and / "
    "filtered MIN: per-key predicate summaries (the shape of feature "
    "engineering and data-quality sweeps). One hash agg, no UDFs.",
)
def q68_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").cast("bigint").alias("n_purchases"),
        F.bool_or(F.col("event_type") == "error").alias("had_error"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("event_id")))
        .cast("bigint")
        .alias("first_purchase_id"),
    )


@register(
    "q69_window_breadth",
    """
    SELECT event_id,
           FIRST_VALUE(event_id) OVER w AS first_id,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id
                                      ORDER BY CAST(ts AS TIMESTAMP), event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS last_id,
           ROUND(PERCENT_RANK() OVER w, 4) AS pr,
           ROUND(CUME_DIST() OVER w, 4) AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    doc="W3/W5 breadth — first_value / last_value (explicit full frame: "
    "the default frame would stop at CURRENT ROW) / percent_rank / "
    "cume_dist, rounded per D7 since both are ratios.",
)
def q69_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return events.select(
        "event_id",
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(w_full).alias("last_id"),
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    )


@register(
    "q62_histogram",
    """
    SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
    doc="Histogram bucketing — fixed-width bins as a pure expression "
    "group key; the exploration primitive next to q35's sketches.",
)
def q62_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.floor(F.col("value") / 10.0).cast("bigint").alias("bucket")
    ).agg(bcount("cnt"))


@register(
    "q72_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DECIMAL(18,2)) AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
    )
    """,
    doc="Unpivot/melt — wide measures to long (measure, value) rows via "
    "df.unpivot: the inverse of q57's pivot and the standard reshape "
    "before per-measure aggregation. Pure map-side (no shuffle); the "
    "oracle spells it as UNION ALL, which is the same plan.",
)
def q72_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(18,2)").alias("quantity"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("discount"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "val",
    ).withColumn("val", F.col("val").cast("double"))


@register(
    "q73_hash_sample",
    """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    doc="Deterministic hash sampling — a ~1/8 sample selected by digest "
    "prefix instead of rand(): reproducible across engines, runs, and "
    "partitionings (TABLESAMPLE is not), which is what a 100 TB "
    "exploration pass actually needs. Map-side filter, pushdown-safe "
    "on the key column.",
)
def q73_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    prefix = F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 1)
    return orders.filter(prefix.isin("0", "1")).select("o_orderkey", "o_orderstatus")


@register(
    "q93_stratified_sample",
    """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents) x
    WHERE rn <= 20
    """,
    doc="Deterministic stratified sampling with EXACT per-stratum "
    "quotas — eval-set construction's shape (q73/q81 are rate-based; "
    "building a benchmark needs exactly k per language): rank every "
    "doc inside its stratum by md5(doc_id) — a seedable, "
    "engine-portable stand-in for random order — and keep the top 20. "
    "One shuffle on the stratum key; each partition sorts only its "
    "stratum, and at 100 TB the window never sees a SinglePartition "
    "because lang is the partition key. doc_id tiebreak makes the "
    "rank total even under digest collisions (D3).",
)
def q93_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rank = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    w = Window.partitionBy("lang").orderBy(rank, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "q63_grouped_map",
    """
    SELECT event_id, user_id,
           CASE WHEN stddev_pop(value) OVER w = 0 THEN 0.0
                ELSE ROUND((value - avg(value) OVER w)
                           / stddev_pop(value) OVER w, 4) END AS z
    FROM events WINDOW w AS (PARTITION BY user_id)
    """,
    doc="U3 batch grouped-map — per-user z-score of event values via "
    "groupBy().applyInArrow (the spec's per-job post-processing "
    "surface, /root/reference/README.md:93-103): one Arrow batch per "
    "group, vectorized numpy inside, grouped shuffle outside. "
    "Arrow-native rather than applyInPandas since round 16: the "
    "per-group pandas DataFrame construction dominated the stage at "
    "1500 tiny groups (measured 3.3 s vs 0.9 s at sf0.1, guide §4.2) "
    "while numpy over zero-copy Arrow buffers computes the identical "
    "doubles (asserted bitwise-equal to the pandas path at sf0.1). "
    "Tier-1: mean/std(ddof=0) vs DuckDB avg/stddev_pop agree to "
    "~1e-13 while the closest z to a 4dp rounding boundary is 1.2e-8 "
    "away (measured at sf0.01), so ROUND(...,4) hashes identically.",
)
def q63_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    events = load_table(spark, sf_dir, "events")

    def zscore(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        if np.isnan(v).any():
            # null-bearing group: mirror the old pandas skipna
            # semantics (mean/std over the non-null values; null rows
            # keep z = NaN). Never hit on the synthetic corpora (0
            # null values at every SF) — defensive only.
            mean, std = np.nanmean(v), np.nanstd(v)
        else:
            mean, std = v.mean(), v.std()  # ddof=0, as before
        z = (v - mean) / std if std > 0 else v * 0.0
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "user_id": tbl.column("user_id"),
                # from_pandas=True maps NaN → SQL NULL, matching the
                # old applyInPandas semantics for a null-bearing value
                # group (ADVICE r16: a bare pa.array keeps NaN as a
                # non-null NaN value, which would hash-differ from the
                # oracle; unreached on the synthetic corpora —
                # defensive only).
                "z": pa.array(np.round(z, 4), type=pa.float64(), from_pandas=True),
            }
        )

    return events.select("event_id", "user_id", "value").groupBy("user_id").applyInArrow(
        zscore, "event_id bigint, user_id bigint, z double"
    )


@register(
    "q83_cogrouped_map",
    """
    WITH p AS (
      SELECT user_id, count(*) AS n_purchases, max(value) AS max_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    e AS (
      SELECT user_id, count(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT COALESCE(p.user_id, e.user_id) AS user_id,
           COALESCE(n_purchases, 0) AS n_purchases,
           max_purchase,
           COALESCE(n_errors, 0) AS n_errors
    FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
    """,
    doc="U3b co-grouped map — the second grouped-Arrow surface: "
    "groupBy().cogroup().applyInArrow aligns BOTH sides of a key "
    "(purchase events, error events) into one Arrow call per user — "
    "the per-key reconcile/merge shape (spec's per-job result-vs-error "
    "processing, /root/reference/README.md:93-124) without a join. "
    "Cogroup is full-outer on keys; empty sides arrive as empty "
    "tables. Arrow-native rather than applyInPandas since round 16: "
    "building a 1-row pandas DataFrame per key dominated the stage "
    "(guide §4.2); pyarrow.compute.max ignores nulls exactly like the "
    "old pandas skipna max. Only order-free reductions (count/max) "
    "are emitted, so the path is hash-identical to the FULL OUTER "
    "JOIN oracle. At 100 TB both sides shuffle once on user_id and "
    "stream through Arrow batches per key group.",
)
def q83_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    errors = events.filter(F.col("event_type") == "error").select("user_id")

    def reconcile(key, left: pa.Table, right: pa.Table) -> pa.Table:
        mx = pc.max(left.column("value")).as_py() if left.num_rows else None
        return pa.table(
            {
                "user_id": pa.array([key[0].as_py()], type=pa.int64()),
                "n_purchases": pa.array([left.num_rows], type=pa.int64()),
                "max_purchase": pa.array(
                    [None if mx is None else float(mx)], type=pa.float64()
                ),
                "n_errors": pa.array([right.num_rows], type=pa.int64()),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInArrow(
            reconcile,
            "user_id bigint, n_purchases bigint, max_purchase double, n_errors bigint",
        )
    )
