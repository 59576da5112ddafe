"""Text retrieval & language-model quality scoring (north-star family
"text analysis" — SURVEY §2.3 X4 extended): BM25 ranked search over the
document corpus and a unigram-LM perplexity filter, the CCNet/Gopher
family's statistical quality signal.

Both are tier-1 despite being float-scoring queries, via the §2.5 D1/D7
discipline: every per-term float contribution is rounded to 6dp and
CAST to DECIMAL(18,6) BEFORE the per-document sum, so the aggregation
is exact and order-free in both engines; only the final display value
goes back to DOUBLE. The residual cross-engine risk is a per-term value
sitting within ~1ulp of a 6dp rounding boundary (libm ln differs
between JVM and DuckDB in the last ulp) — margins measured in
tests/test_retrieval.py.

Scale posture (100 TB):
- The corpus-level statistics both queries need (document count, total
  token count, average doc length, per-term document/term frequencies)
  are VOCABULARY-sized, not corpus-sized — the df/LM tables broadcast
  (F.broadcast is explicit) and scoring is a map-side explode + join +
  per-doc aggregation keyed by doc_id. No O(n²), no global sort except
  the final top-k (TakeOrderedAndProject).
- The stats scan and the scoring scan are the only corpus passes (two
  total; one if the stats are maintained incrementally by ingestion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register

#: BM25 free parameters (Robertson et al.; the universal defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: The fixed search query the catalog entry ranks against.
BM25_QUERY_TERMS = ("join", "hash", "batch")


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) multiset with empty tokens dropped (§2.5 D9)."""
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return docs.select("doc_id", F.explode(toks).alias("token"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k documents for a bag of query terms.

    Dataflow: one corpus scan builds (doc, term, tf, dl); the df table
    (per-term document frequency) and the scalar stats (N, avgdl) are
    vocabulary-sized and broadcast; per-(doc,term) scores are map-side
    arithmetic; the per-doc sum is DECIMAL-exact (D1) and the top-k is
    a TakeOrderedAndProject with doc_id tiebreak (D3).

    ``query_terms`` is an arbitrary user bag: duplicates are collapsed
    (a repeated term must not double its df or score twice) and terms
    pass through typed literal columns only — never spliced into SQL
    text — so quotes/commas in a term cannot break or inject the plan."""
    query_terms = list(dict.fromkeys(query_terms))
    # ONE corpus pass: doc length and each query term's tf in a single
    # explode + groupBy; everything downstream is doc-sized or smaller.
    # The checkpoint stops the three consumers (stats, df, scoring)
    # from re-running the explode — measured 8.4s -> ~1s at sf0.01.
    toks = _tokens(docs)
    perdoc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("token") == t).cast("long")).alias(f"tf_{i}")
                for i, t in enumerate(query_terms)
            ],
        )
        .localCheckpoint(eager=True)
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        perdoc.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("token"), F.col(f"tf_{i}").alias("tf")
                        )
                        for i, t in enumerate(query_terms)
                    ]
                )
            ).alias("kv"),
        )
        .select("doc_id", "dl", "kv.token", "kv.tf")
        .filter(F.col("tf") > 0)
    )
    df_tab = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_tab), "token").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf")
        * (1.0 + k1)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        scored.withColumn(
            "ts", F.round(term_score, 6).cast("decimal(18,6)")
        )
        .groupBy("doc_id")
        .agg(F.sum("ts").cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


_BM25_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
      FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM doclen),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('join', 'hash', 'batch')
      GROUP BY doc_id, token
    ),
    dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * (1.0 + {BM25_K1})
                  / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                     + {BM25_B} * doclen.dl / stats.avgdl))), 6)
               AS DECIMAL(18,6)) AS ts
      FROM tf JOIN dft USING (token) JOIN doclen USING (doc_id), stats
    )
    SELECT doc_id, CAST(SUM(ts) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


@register(
    "q88_bm25",
    _BM25_ORACLE,
    doc="X4 ranked text retrieval — BM25 top-10 for the query "
    f"{BM25_QUERY_TERMS} over the documents table (k1={BM25_K1}, "
    f"b={BM25_B}, idf = ln(1 + (N-df+0.5)/(df+0.5)) — the "
    "Lucene-standard non-negative variant). The df table and corpus "
    "stats broadcast (vocabulary-sized); scoring is map-side; the "
    "per-doc sum is DECIMAL(18,6)-exact after 6dp per-term rounding "
    "(D1/D7 — order-free, so Spark partial aggregation and DuckDB "
    "agree bit-for-bit); top-k is TakeOrderedAndProject with doc_id "
    "tiebreak (D3). Two corpus scans total (stats + scoring); at "
    "100 TB the stats pass amortizes across queries or moves into "
    "ingestion.",
)
def q88_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, list(BM25_QUERY_TERMS))


#: Keep-threshold for the perplexity gate: uniform-over-31-words gives
#: avg NLL = ln(31) ~ 3.434; corpus-typical docs land slightly below.
PPL_NLL_THRESHOLD = 3.43


def unigram_nll(docs: DataFrame) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own unigram LM (MLE, no smoothing needed: every doc token is by
    construction in the corpus vocabulary).

    The LM table is vocabulary-sized → broadcast; scoring joins each
    doc's term counts to it map-side; the per-doc sum multiplies each
    term's 6dp-rounded -ln P(w) (DECIMAL-exact) by its integer term
    frequency, so accumulation order cannot matter (D1)."""
    # one corpus explode; the corpus-level LM derives from the per-doc
    # term counts (sum of tf == corpus tf), so no second pass
    term_doc = (
        _tokens(docs)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    corpus = term_doc.groupBy("token").agg(F.sum("tf").alias("ctf"))
    total = corpus.agg(F.sum("ctf").alias("n_total"))
    lm = corpus.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(-F.log(F.col("ctf") / F.col("n_total")), 6)
        .cast("decimal(18,6)")
        .alias("nll"),
    )
    return (
        term_doc.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf").cast("decimal(18,6)") * F.col("nll")).alias("sum_nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("sum_nll").cast("double") / F.col("n_tokens"), 4
            ).alias("avg_nll"),
        )
    )


_PPL_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
      FROM documents
    ),
    term_doc AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    corpus AS (SELECT token, COUNT(*) AS ctf FROM toks GROUP BY token),
    total AS (SELECT SUM(ctf) AS n_total FROM corpus),
    lm AS (
      SELECT token,
             CAST(ROUND(-ln(CAST(ctf AS DOUBLE) / n_total), 6) AS DECIMAL(18,6)) AS nll
      FROM corpus, total
    ),
    perdoc AS (
      SELECT term_doc.doc_id,
             CAST(SUM(tf) AS BIGINT) AS n_tokens,
             SUM(CAST(tf AS DECIMAL(18,6)) * lm.nll) AS sum_nll
      FROM term_doc JOIN lm USING (token)
      GROUP BY term_doc.doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(sum_nll AS DOUBLE) / n_tokens, 4) AS avg_nll,
           ROUND(CAST(sum_nll AS DOUBLE) / n_tokens, 4) <= {PPL_NLL_THRESHOLD} AS keep
    FROM perdoc
"""


@register(
    "q89_unigram_ppl",
    _PPL_ORACLE,
    doc="X4 statistical quality gate — per-document average negative "
    "log-likelihood under the corpus unigram LM (the CCNet/Gopher "
    "perplexity-filter shape, with the corpus itself as the LM since "
    "no external model ships with the engine). keep = avg NLL <= "
    f"{PPL_NLL_THRESHOLD} (uniform-over-vocab gives ln(31) ~ 3.434; "
    "lower = more predictable text). LM table broadcast "
    "(vocabulary-sized); per-term -ln P rounded to 6dp and DECIMAL-"
    "multiplied by integer tf so the per-doc sum is exact and "
    "order-free (D1/D7); the final division+round happens once per "
    "doc. The keep flag derives from the already-rounded value, so "
    "it hashes identically too. Two corpus scans (LM + scoring).",
)
def q89_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nll = unigram_nll(docs)
    return nll.select(
        "doc_id",
        "n_tokens",
        "avg_nll",
        (F.col("avg_nll") <= PPL_NLL_THRESHOLD).alias("keep"),
    )
