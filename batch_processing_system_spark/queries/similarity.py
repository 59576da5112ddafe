"""Similarity search & near-duplicate detection (SURVEY §2.3 X2/X3;
north-star families "dedup" and "similarity search").

All tier-2 (rows-only oracle checks): LSH bucketing and float
accumulation are not hash-comparable across engines (SURVEY §2.5 D7,
§7 H5), but every query here is internally deterministic — seeds
fixed, ties broken on ids — so reruns are stable.

Scale posture per query:
- MinHashLSH / BucketedRandomProjectionLSH: candidate generation is a
  band-bucket equi-join — shuffle on bucket keys, never O(n²).
- SimHash: 64-bit fingerprints + 4×16-bit band join; candidate pairs
  verified by popcount(xor) — pure JVM bit ops.
- Exact brute-force variants exist as correctness baselines; each
  docstring names its 100 TB replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register

SEED = 42


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + distinct n-word shingles (the dedup feature space —
    word sequences, not word sets: the 31-word synthetic vocabulary
    makes bag-of-words features collide everywhere)."""
    words = docs.select("doc_id", F.split("text", " ").alias("ws"))
    idx = F.sequence(F.lit(0), F.size("ws") - n)
    return (
        words.select("doc_id", F.explode(idx).alias("i"), "ws")
        .select(
            "doc_id",
            F.concat_ws(
                " ", *[F.element_at("ws", F.col("i") + k + 1) for k in range(n)]
            ).alias("shingle"),
        )
        .distinct()
    )


@register(
    "q42",
    None,  # tier-2: LSH bucket boundaries aren't oracle-hashable
    doc="X2 MinHashLSH near-dup candidate pairs — shingle → HashingTF → "
    "MinHash banding → approxSimilarityJoin (Jaccard distance ≤ 0.4), "
    "emitted as doc_id_a < doc_id_b. Seeded (H5). The scalable near-dup "
    "path: candidates come from bucket joins, verification from exact "
    "Jaccard on the candidate set only (q46_neardup_jaccard is the "
    "exact-verification twin).",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    feats = (
        _shingles(docs)
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("tokens"))
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    vecs = tf.transform(feats)
    # 6 tables: measured 100% recall vs the exact-Jaccard twin at both
    # sf0.01 and sf0.1 (and still 100% at 4) — the extra tables only
    # multiply the explode+join cost of candidate generation.
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=6, seed=SEED)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.4, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id_a"),
            F.col("datasetB.doc_id").alias("doc_id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    [row] = emb.filter(F.col("vec_id") == vec_id).select("embedding").collect()
    return [float(x) for x in row["embedding"]]


def _cosine(vec_col, qvec: list[float]):
    """cos(embedding, q) as pure higher-order-function expressions —
    JVM-side, no UDF: zip_with for the dot product, aggregate for the
    fold (SURVEY §2.3 C5)."""
    q = F.array(*[F.lit(x) for x in qvec])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    norm_q = float(sum(x * x for x in qvec)) ** 0.5
    return dot / (norm_v * F.lit(norm_q))


@register(
    "q43",
    None,  # tier-2: float accumulation order (SURVEY §2.4)
    doc="X3 exact top-k vector similarity — brute-force cosine of every "
    "vector vs the query (vec_id=0), TakeOrderedAndProject top-5 with "
    "vec_id tiebreak. The correctness baseline: one scan, no shuffle "
    "except the final top-k merge; at 100 TB the IVF/LSH variant "
    "(q53_ann_lsh) prunes the scan to candidate buckets.",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = _query_vector(spark, sf_dir, 0)
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(_cosine(F.col("embedding"), qvec), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


@register(
    "q53_ann_lsh",
    None,  # tier-2: LSH is approximate by construction
    doc="X3 approximate nearest neighbors — unit-normalize, then "
    "BucketedRandomProjectionLSH.approxNearestNeighbors: euclidean on "
    "the unit sphere is monotone in cosine (d² = 2−2cos), so bucket "
    "pruning answers cosine top-k. Seeded. This is the 100 TB path: "
    "the scan touches only hash-colliding buckets.",
)
def q53_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
    )
    unit = Normalizer(inputCol="raw", outputCol="unit", p=2.0).transform(vecs)
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit", outputCol="hashes", bucketLength=0.5, numHashTables=6, seed=SEED
    )
    model = lsh.fit(unit)
    qvec = _query_vector(spark, sf_dir, 0)
    norm = sum(x * x for x in qvec) ** 0.5
    key = Vectors.dense([x / norm for x in qvec])
    ann = model.approxNearestNeighbors(unit.filter(F.col("vec_id") != 0), key, 5)
    return ann.select("vec_id", F.round("distCol", 4).alias("euclid_dist"))


@register(
    "q51_simhash",
    None,  # tier-2: xxhash64 has no DuckDB counterpart
    doc="X2 SimHash near-dup — 64-bit fingerprint per doc "
    "(sign-aggregated xxhash64 bits over 3-gram shingles, all JVM bit "
    "ops), then 4×16-bit band self-join for candidates and "
    "popcount(xor) ≤ 6 verification. Banding makes candidate generation "
    "an equi-join: no O(n²) anywhere, shuffle keyed on (band, value).",
)
def q51_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # multiset shingles (no distinct): SimHash weights features by
    # occurrence anyway, and skipping the dedup saves a full shuffle —
    # the vote aggregation below is the only wide stage before banding.
    words = docs.select("doc_id", F.split("text", " ").alias("ws"))
    idx = F.sequence(F.lit(0), F.size("ws") - 3)
    sh = words.select("doc_id", F.explode(idx).alias("i"), "ws").select(
        "doc_id",
        F.concat_ws(
            " ", *[F.element_at("ws", F.col("i") + k + 1) for k in range(3)]
        ).alias("shingle"),
    ).withColumn("h", F.xxhash64("shingle"))
    # per-bit ±1 vote per doc; sign of the vote = fingerprint bit
    votes = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR == +
    fps = votes.select("doc_id", fp.alias("simhash"))

    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= 6)


@register(
    "q54_cosine_neardup",
    None,  # tier-2: float accumulation
    doc="X2 embedding-cosine near-dup pairs (cos ≥ 0.45), exact, via a "
    "broadcast matrix + Arrow-batched mapInPandas: each partition "
    "multiplies its rows against the full normalized matrix (numpy "
    "BLAS), emitting id_a < id_b pairs. O(n²/partitions) compute with "
    "no shuffle — right up to the point the matrix outgrows the "
    "broadcast budget, where the LSH variants take over.",
)
def q54_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block_sims(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.stack(pdf["embedding"].map(np.asarray, na_action=None)).astype(np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ all_mat.T
            rows_out = []
            for i, vid in enumerate(pdf["vec_id"]):
                js = np.nonzero((sims[i] >= 0.45) & (all_ids > vid))[0]
                for j in js:
                    rows_out.append((int(vid), int(all_ids[j]), round(float(sims[i][j]), 4)))
            yield pd.DataFrame(rows_out, columns=["vec_id_a", "vec_id_b", "cos_sim"])

    return emb.select("vec_id", "embedding").mapInPandas(
        block_sims, "vec_id_a bigint, vec_id_b bigint, cos_sim double"
    )
