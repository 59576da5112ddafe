"""The FULL curation pipeline as one incremental stream — the
batch≡stream twin of q75: quality gate → exact dedup → near-dup drop
→ deterministic split, applied to every arriving document exactly
once, with append-only accepted output.

Semantics mirror q75 PRECISELY under the time-ordered (doc_id-ordered)
replay contract the other twins share:

- quality: n_tokens ≥ 10 AND 10·n_uniq ≥ 3·n_tokens (stateless);
- exact dedup: the FIRST quality-passing arrival of each content
  digest survives (≡ batch min-doc_id survivor); the digest store
  holds quality-passing digests only, because q75 groups digests
  AFTER the gate — a later quality-passing twin of a quality-FAILED
  doc is a first arrival, not a duplicate;
- near-dup: q75 drops the doc_id_b side of EVERY exact-Jaccard≥0.6
  pair — i.e. an arrival is rejected if it pairs with ANY earlier
  document, kept or not (unlike streaming/neardup.py's greedy
  kept-only contract). The band/text stores therefore index EVERY
  seen document; that store is corpus-sized by design — the faithful
  b-side-drop rule costs a full index where greedy costs a kept-only
  one (both are documented contracts; q75 defines this one);
- split: md5(doc_id) first hex digit, 0-c → train (map-side).

Candidate generation is MinHash banding (the q42 family, seed-stable
across batches); recall vs the exact inverted index is MEASURED by the
equality test, not assumed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .neardup import (
    BAND_SCHEMA,
    _band_table,
    _read_or_empty,
    _verified_pairs,
)

INCOMING_CURATION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_DIGEST_SCHEMA = T.StructType([T.StructField("h", T.StringType())])

ACCEPTED_SCHEMA = (
    "doc_id bigint, lang string, n_tokens bigint, split string"
)


def curation_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str
) -> DataFrame:
    """Run one micro-batch through the full pipeline against the
    persistent stores under ``state_dir``; returns the accepted rows
    (appended to the output store by the caller)."""
    from ..queries.similarity import _shingles

    docs_path = os.path.join(state_dir, "docs")
    bands_path = os.path.join(state_dir, "bands")
    digests_path = os.path.join(state_dir, "digests")

    batch = batch.localCheckpoint(eager=True)
    if batch.limit(1).count() == 0:
        return spark.createDataFrame([], ACCEPTED_SCHEMA)

    toks_arr = F.filter(F.split("text", " "), lambda w: w != "")
    feats = batch.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks_arr).alias("n_tokens"),
        F.size(F.array_distinct(toks_arr)).alias("n_uniq"),
        F.md5(F.encode("text", "UTF-8")).alias("h"),
    ).localCheckpoint(eager=True)

    # --- near-dup b-side rule vs EVERY earlier doc -------------------
    bands = _band_table(batch).localCheckpoint(eager=True)
    store_bands = _read_or_empty(spark, bands_path, BAND_SCHEMA)
    cross = (
        bands.alias("new")
        .join(
            store_bands.alias("old"),
            (F.col("new.band") == F.col("old.band"))
            & (F.col("new.h") == F.col("old.h")),
        )
        .select(
            F.col("old.doc_id").alias("da"), F.col("new.doc_id").alias("db")
        )
        .distinct()
    )
    wb = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    cand = cross.unionAll(wb).distinct()
    store_docs = _read_or_empty(spark, docs_path, _DOC_SCHEMA)
    involved_old = store_docs.join(
        cand.select(F.col("da").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    sh_union = _shingles(
        batch.select("doc_id", "text").unionByName(involved_old), n=5
    ).localCheckpoint(eager=True)
    near_rejected = (
        _verified_pairs(cand, sh_union)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )

    # --- quality gate + exact dedup ----------------------------------
    quality = feats.where(
        (F.col("n_tokens") >= 10)
        & (F.col("n_uniq") * 10 >= F.col("n_tokens") * 3)
    )
    digest_store = _read_or_empty(spark, digests_path, _DIGEST_SCHEMA)
    first_in_batch = (
        quality.groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
        .select(F.col("keep_id").alias("doc_id"))
    )
    exact_ok = (
        quality.join(first_in_batch, "doc_id", "left_semi")
        .select("doc_id", "lang", "n_tokens", "h")
        .join(digest_store, "h", "left_anti")
    )

    prefix = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1
    )
    accepted = (
        exact_ok.join(near_rejected, "doc_id", "left_anti")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.when(prefix.between("0", "c"), F.lit("train"))
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
        .localCheckpoint(eager=True)
    )

    # --- store appends (EVERY doc indexes; quality digests only) -----
    batch.select("doc_id", "text").write.mode("append").parquet(docs_path)
    bands.select("band", "h", "doc_id").write.mode("append").parquet(bands_path)
    quality.select("h").distinct().write.mode("append").parquet(digests_path)
    return accepted


def run_curation_stream(
    spark: SparkSession,
    incoming_dir: str,
    state_dir: str,
    out_path: str,
    checkpoint: str,
):
    """Replayed document JSONL → append-only curated corpus."""
    src = spark.readStream.schema(INCOMING_CURATION_SCHEMA).json(incoming_dir)

    def sink(batch_df: DataFrame, _bid: int) -> None:
        accepted = curation_batch(batch_df.sparkSession, batch_df, state_dir)
        accepted.write.mode("append").parquet(out_path)

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
