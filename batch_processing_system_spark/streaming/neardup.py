"""Continuous NEAR-dup dedup at ingest — the streaming twin of the
q42/q46 MinHash pipeline (north-star family "dedup", approximate
form). streaming/dedup.py rejects exact copies; this rejects arriving
documents whose 5-shingle Jaccard vs an ALREADY-KEPT document is
≥ 0.6, with greedy first-arrival-wins semantics (the production
near-dup-at-ingest contract: the corpus never admits a near-copy of
anything it already holds).

State is externalized to two parquet stores, like the exact twin:

- **band store** (band, h, doc_id): one row per MinHash band per kept
  document. Candidate generation is an equi-join of the batch's bands
  against this store — shuffle ships 16 small rows per doc, never
  texts, and only band-colliding pairs go to verification.
- **corpus store** (doc_id, text): kept documents; verification
  re-shingles only the candidates' texts (bounded by the candidate
  set, the q42 discipline).

MinHash hash functions are drawn from the SEED alone (verified by
test: two fits on disjoint data transform identically), so per-batch
fits across the stream's life are ONE consistent hash family — the
band store stays joinable forever.

Within a batch, survivors are decided by greedy ascending-doc_id over
the VERIFIED pair graph (chain a~b, b~c, a≁c keeps a AND c — exactly
what arrival-order greedy would do if they arrived separately), so a
doc_id-ordered replay of a corpus equals the global greedy over the
batch q46 exact pair set; the equality test asserts that. The pair
graph collect is budget-capped (_MAX_BATCH_PAIRS): near-dup pair
graphs are output-sized, and a batch that exceeds the cap should
shrink its trigger interval, not silently spill the driver.
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42
N_TABLES = 16
_MAX_BATCH_PAIRS = 2_000_000

INCOMING_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BAND_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("h", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ]
)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    if os.path.exists(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def _band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band, h) MinHash band rows for a document set — the
    same 16-table family q42 uses (HashingTF 2^16 + MinHashLSH(SEED));
    hash coefficients derive from SEED only, so every call produces
    the same family."""
    from ..queries.similarity import _shingles

    sh = _shingles(docs, n=5)
    feats = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("tokens"))
    feats = feats.filter(F.size("tokens") > 0)
    if feats.limit(1).count() == 0:  # all-short batch: nothing to band
        return docs.sparkSession.createDataFrame([], BAND_SCHEMA).select(
            "doc_id", "band", "h"
        )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    vecs = tf.transform(feats)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=N_TABLES, seed=SEED
    )
    hashed = lsh.fit(vecs).transform(vecs)
    return hashed.select(
        "doc_id", F.posexplode("hashes").alias("band", "hv")
    ).select(
        "doc_id",
        F.col("band").cast("int").alias("band"),
        F.element_at(vector_to_array("hv"), 1).cast("long").alias("h"),
    )


def _verified_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    from ..queries.similarity import _verify_jaccard_pairs

    return _verify_jaccard_pairs(cand, sh)


def neardup_batch(
    spark: SparkSession, batch: DataFrame, corpus_path: str, bands_path: str
) -> DataFrame:
    """One micro-batch of near-dup dedup against the persistent stores.

    Returns the decision table (doc_id, kept, dup_of): dup_of is the
    smallest kept document the rejected arrival verified against
    (cross-batch matches win over within-batch ones — the earlier
    arrival IS the canonical copy). Survivors' texts and bands are
    appended to the stores."""
    from ..queries.similarity import _shingles

    batch = batch.localCheckpoint(eager=True)
    # bounded-collect: micro-batch id list (batch-sized, not corpus)
    batch_ids = sorted(r["doc_id"] for r in batch.select("doc_id").collect())
    if not batch_ids:
        return spark.createDataFrame([], "doc_id bigint, kept boolean, dup_of bigint")
    bands = _band_table(batch).localCheckpoint(eager=True)
    store_bands = _read_or_empty(spark, bands_path, BAND_SCHEMA)

    # --- cross-batch candidates: batch bands ⋈ kept bands ------------
    cross = (
        bands.alias("new")
        .join(
            store_bands.alias("old"),
            (F.col("new.band") == F.col("old.band"))
            & (F.col("new.h") == F.col("old.h")),
        )
        .select(
            F.col("old.doc_id").alias("da"),  # kept doc
            F.col("new.doc_id").alias("db"),  # arrival
        )
        .distinct()
    )
    corpus = _read_or_empty(spark, corpus_path, CORPUS_SCHEMA)
    involved_kept = corpus.join(
        cross.select(F.col("da").alias("doc_id")).distinct(), "doc_id", "left_semi"
    )
    sh_union = _shingles(batch.unionByName(involved_kept), n=5).localCheckpoint(
        eager=True
    )
    cross_hits = (
        _verified_pairs(cross, sh_union)
        .groupBy(F.col("doc_id_b").alias("doc_id"))
        .agg(F.min("doc_id_a").alias("dup_of"))
    )

    # --- within-batch candidates among docs not already rejected -----
    remaining = bands.join(
        cross_hits.select("doc_id"), "doc_id", "left_anti"
    )
    wb_cand = (
        remaining.alias("a")
        .join(
            remaining.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    wb_pairs_df = _verified_pairs(wb_cand, sh_union).select("doc_id_a", "doc_id_b")
    # bounded-collect: verified near-dup pairs are output-sized; the
    # assert enforces the documented per-batch budget rather than
    # letting an adversarial batch spill the driver
    wb_pairs = wb_pairs_df.limit(_MAX_BATCH_PAIRS + 1).collect()
    assert len(wb_pairs) <= _MAX_BATCH_PAIRS, "batch pair graph over budget"

    neighbors = defaultdict(set)
    for r in wb_pairs:
        neighbors[r["doc_id_b"]].add(r["doc_id_a"])
    # bounded-collect: rejected arrivals ≤ batch size
    cross_rejected = {
        int(r["doc_id"]): int(r["dup_of"]) for r in cross_hits.collect()
    }
    rejected_wb: dict[int, int] = {}
    kept_wb: set[int] = set()
    # Docs too short to shingle (< 5 words) have no bands and cannot be
    # near-dup of anything under the 5-shingle feature space: kept.
    for doc_id in batch_ids:
        if doc_id in cross_rejected:
            continue
        smaller_kept = sorted(n for n in neighbors[doc_id] if n in kept_wb)
        if smaller_kept:
            rejected_wb[doc_id] = smaller_kept[0]
        else:
            kept_wb.add(doc_id)

    # --- decisions + store appends -----------------------------------
    cross_rows = [(d, False, k) for d, k in cross_rejected.items()]
    wb_rows = [(int(d), False, int(k)) for d, k in rejected_wb.items()]
    kept_rows = [(int(d), True, None) for d in kept_wb]
    decisions = spark.createDataFrame(
        cross_rows + wb_rows + kept_rows,
        "doc_id bigint, kept boolean, dup_of bigint",
    )
    survivors = batch.join(
        decisions.filter("kept").select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint(eager=True)
    survivors.write.mode("append").parquet(corpus_path)
    bands.join(survivors.select("doc_id"), "doc_id", "left_semi").select(
        "band", "h", "doc_id"
    ).write.mode("append").parquet(bands_path)
    return decisions


def stream_neardup_documents(
    spark: SparkSession,
    incoming_dir: str,
    corpus_path: str,
    bands_path: str,
    decisions_path: str,
    checkpoint: str,
):
    """JSONL document stream → greedy near-dup dedup → append-only kept
    corpus + band store + decision log. File offsets live in the
    checkpoint; the stores are the cross-restart dedup memory.

    BATCH-SIZE CONTRACT (the sink's operating envelope): per
    micro-batch the driver materializes (a) the batch's doc_id list,
    (b) the within-batch candidate pair graph, and (c) the store-hit
    pairs — all bounded by micro-batch size, with the pair graph
    additionally hard-capped at _MAX_BATCH_PAIRS (2M; the batch FAILS
    LOUDLY over budget rather than spilling the driver). Size
    triggers accordingly: ≤ ~100k docs per micro-batch keeps (a)/(c)
    in tens of MB, and a batch would need ~every doc pairing with
    every other to trip (b)'s cap — if your ingest can contain such a
    burst (e.g. a mirror dump), pre-shard it into smaller files or
    use maxFilesPerTrigger; the greedy within-batch resolution is
    sequential by design (first arrival wins) and is the documented
    cost of the kept-only store contract."""
    incoming = spark.readStream.schema(INCOMING_DOC_SCHEMA).json(incoming_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        decisions = neardup_batch(
            batch_df.sparkSession, batch_df, corpus_path, bands_path
        )
        decisions.write.mode("append").parquet(decisions_path)

    return incoming.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
