"""Adversarial skew stress for the dedup/similarity/assembly family
(SCALE.md "Adversarial skew" table).

Builds a hostile corpus at 10x sf0.1 scale:

  - 10 structure-preserving replicas of sf0.1 documents (word-prefixed,
    disjoint shingle spaces — same recipe as scale_probe.py),
  - ONE document duplicated 10,000 times (distinct doc_ids, identical
    text) — the degenerate exact-dup cluster,
  - ONE domain ('hotdomain') owning 50% of all documents.

and times the operators the skew actually stresses, on both the plain
10x corpus and the hostile one, so the delta isolates the skew cost:

  q45   exact dedup        — one digest key carries 10^4 rows
  q79   det shuffle        — hot domain must not unbalance buckets
  q81   domain mix         — one domain = 50% of rows
  join  source equi-join   — 50% of probe rows hit one build key
                             (AQE skew-join splitting is the handler)

For the near-dup family the hostile cluster is handled by PIPELINE
COMPOSITION, not per-operator heroics: a 10^4 exact-dup cluster has
C(10^4,2) ~ 5*10^7 near-dup PAIRS, so any operator that enumerates
pairs is quadratic in the cluster BY ITS OUTPUT SHAPE. The scalable
form — what q75 does — is exact-dedup first (one representative per
digest), near-dup over representatives, then component membership by
digest expansion (linear in corpus size). This probe times q42/q46/
q74 over the representative corpus and the expansion join, proving
the composed path is flat while the raw pair enumeration would emit
50M rows.

Usage: python tools/skew_probe.py          # prints one JSON line per row
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.1"
PLAIN_DIR = "/tmp/skew_plain10"
HOT_DIR = "/tmp/skew_hot10"
REP_DIR = "/tmp/skew_hot10_rep"
REPLICAS = 10
HOT_COPIES = 10_000
# must keep the corpus's 'src<N>' shape (q81 parses the numeric part);
# src0 is the highest-rate mix bucket, so making it 50% of the corpus
# is the adversarial case for the sampler too
HOT_SOURCE = "src0"


def _replicate_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    reps = []
    for i in range(REPLICAS):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:
            r = r.withColumn("text", F.regexp_replace("text", r"(\w+)", f"r{i}$1"))
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out


def build(spark) -> None:
    for d in (PLAIN_DIR, HOT_DIR, REP_DIR):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)

    plain = _replicate_docs(spark)
    plain.write.mode("overwrite").parquet(os.path.join(PLAIN_DIR, "documents.parquet"))

    # hostile: same 10x corpus, but (a) half of all docs belong to one
    # domain, (b) one text appears 10^4 times under fresh doc_ids
    half_hot = plain.withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit(HOT_SOURCE)).otherwise(F.col("source")),
    )
    [hot_text] = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 0)
        .select("text")
        .collect()
    )  # bounded-collect: unique-key filter, exactly 1 row
    clones = spark.range(HOT_COPIES).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit(hot_text["text"]).alias("text"),
        F.lit("en").alias("lang"),
        F.lit(HOT_SOURCE).alias("source"),
        F.lit(len(hot_text["text"])).cast("bigint").alias("n_chars"),
    )
    hot = half_hot.unionByName(clones)
    hot.write.mode("overwrite").parquet(os.path.join(HOT_DIR, "documents.parquet"))

    # representative corpus: q45's survivor set — one doc per digest.
    # This is the composed pipeline's near-dup input: the 10^4-cluster
    # collapses to one row BEFORE any pair-shaped operator runs.
    hot_docs = load_table(spark, HOT_DIR, "documents")
    keep = hot_docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    reps = hot_docs.join(
        keep.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    reps.write.mode("overwrite").parquet(os.path.join(REP_DIR, "documents.parquet"))


def _t(fn) -> float:
    fn()  # warm
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    _ensure_loaded()
    spark = get_spark(
        "skew-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    # --- named queries under key skew -------------------------------
    for name in ("q45_dedup_exact", "q79_det_shuffle", "q81_domain_mix"):
        fn = REGISTRY[name].fn
        plain = _t(lambda: fn(spark, PLAIN_DIR).collect())
        hot = _t(lambda: fn(spark, HOT_DIR).collect())
        emit(
            probe=name,
            plain10x_s=plain,
            hostile10x_s=hot,
            skew_cost=round(hot / plain, 2) if plain else None,
        )

    # --- hot-key equi-join: 50% of probe rows hit one build key ------
    def hot_join():
        docs = load_table(spark, HOT_DIR, "documents")
        dim = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        (
            docs.join(dim, "source")
            .groupBy("source")
            .agg(F.sum("n_chars").alias("chars"), F.max("n_docs").alias("n"))
            .collect()
        )

    emit(probe="hot_source_join", hostile10x_s=_t(hot_join), handler="AQE skew split + partial agg")

    # --- near-dup family: composed (representative) path -------------
    for name in ("q46_neardup_jaccard", "q42", "q74_neardup_components"):
        fn = REGISTRY[name].fn
        emit(probe=f"{name}@representatives", hostile10x_s=_t(lambda: fn(spark, REP_DIR).collect()))

    # membership expansion: component labels back onto ALL doc ids via
    # the digest map — the linear step that replaces 5*10^7 pair rows
    def expand():
        hot_docs = load_table(spark, HOT_DIR, "documents")
        digests = hot_docs.select(
            "doc_id", F.md5(F.encode("text", "UTF-8")).alias("h")
        )
        keep = digests.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
        comp = REGISTRY["q74_neardup_components"].fn(spark, REP_DIR)
        n = (
            digests.join(keep, "h")
            .join(
                comp.select(F.col("doc_id").alias("rep_id"), "component"),
                "rep_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("component", F.col("rep_id")).alias("component"),
            )
            .count()
        )
        assert n == REPLICAS * 5000 + HOT_COPIES, n

    emit(probe="component_membership_expansion", hostile10x_s=_t(expand))
    emit(
        note=(
            "raw pair enumeration over the 10^4-copy cluster would emit "
            "C(10^4,2)=49,995,000 pairs — quadratic in the cluster by "
            "output shape; the composed path above replaces it"
        )
    )


if __name__ == "__main__":
    main()
