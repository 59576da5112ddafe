"""r08/r09 — trained-BPE tokenization (SURVEY §2.3 X4 upgraded).

The engine's token counting (q48) is a whitespace/regex split; these
queries run a REAL trained byte-pair-encoding tokenizer
(functions/bpe.py): merges learned from the sf0.01 documents corpus by
``tools/make_bpe_fixture.py`` and committed as
``fixtures/bpe/merges.txt`` — the tokenizer-file-as-artifact shape
every training pipeline uses (train once on a bounded vocab, ship the
merge table, apply map-side everywhere).

- r08 tokenizes a COMMITTED set of fixture texts (edge cases: unseen
  characters, repeated words, multi-space runs) and hash-compares
  against VALUES pinned by the INDEPENDENT implementation in
  tests/_bpe_reference.py (single-pass rank-order apply; different
  mechanics from the engine's lowest-rank-first loop) — the q99
  independent-encoder discipline.
- r09 runs the same committed tokenizer over the sf_dir documents
  corpus (per-source token totals). BPE apply is iterative per word —
  genuinely non-SQL-expressible — so r09 registers no oracle and takes
  the driver's rows-only check; its exactness evidence is the pytest
  corpus-equality test (engine pipeline ≡ independent reference on the
  full sf0.001 corpus) plus r08's hash-exact fixture row.

Scale: apply is an Arrow-batched pandas UDF with a per-executor LRU
word cache — zero shuffle; r09 adds one vocabulary-sized aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from ..functions.bpe import load_merges, make_tokenize_udf
from . import register

MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "bpe", "merges.txt",
)

#: Committed fixture texts for the hash-checked r08 row set. Edge cases:
#: unseen characters (digits/punctuation never in the training corpus),
#: a word the merge table fully fuses, repeated words (exercises the
#: apply cache), multi-space runs, and the empty-after-split string.
FIXTURE_TEXTS: list[tuple[int, str]] = [
    (1, "the fast key order sort"),
    (2, "stream stream stream"),
    (3, "window   spark    batch"),
    (4, "unseen-!@#$ z9q8x7"),
    (5, "tokenization of compound hashjoin megawindow"),
    (6, "a"),
    (7, "scan merge part window small hash scan join"),
    (8, "the the the the the"),
]

# Pinned by tools/make_bpe_fixture.py via tests/_bpe_reference.py —
# regenerate and repaste when merges.txt or FIXTURE_TEXTS change.
_BPE_ORACLE = """
    SELECT * FROM (VALUES
    (1, CAST(5 AS BIGINT), 'the</w> fast</w> key</w> order</w> sort</w>'),
    (2, CAST(3 AS BIGINT), 'stream</w> stream</w> stream</w>'),
    (3, CAST(3 AS BIGINT), 'window</w> spark</w> batch</w>'),
    (4, CAST(19 AS BIGINT), 'u n s e e n - ! @ # $ </w> z 9 q 8 x 7 </w>'),
    (5, CAST(31 AS BIGINT), 't o k e n i z at i o n</w> o f </w> co m p o u n d </w> h as h join</w> m e g a window</w>'),
    (6, CAST(1 AS BIGINT), 'a</w>'),
    (7, CAST(8 AS BIGINT), 'scan</w> merge</w> part</w> window</w> small</w> hash</w> scan</w> join</w>'),
    (8, CAST(5 AS BIGINT), 'the</w> the</w> the</w> the</w> the</w>')
    ) AS t(text_id, n_tokens, tokens)
"""


@register(
    "r08_bpe_tokens",
    _BPE_ORACLE,
    doc="Trained-BPE tokenization of committed fixture texts vs VALUES "
    "pinned by an independently-written BPE implementation. sf_dir is "
    "unused by design (tokenizer correctness does not scale with sf; "
    "the corpus-scale run is r09).",
)
def r08_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = load_merges(MERGES_PATH)
    tok = make_tokenize_udf(merges)
    df = spark.createDataFrame(FIXTURE_TEXTS, "text_id int, text string")
    toks = tok(F.col("text"))
    return df.select(
        "text_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_join(toks, " ").alias("tokens"),
    )


@register(
    "r09_bpe_corpus",
    None,  # iterative subword merge — non-SQL-expressible; rows-only check
    doc="Committed-tokenizer BPE over the sf_dir documents corpus: "
    "per-source document count, total and max token counts. Map-side "
    "tokenize (Arrow batches, LRU word cache) + one small aggregation; "
    "exactness evidence = pytest corpus equality vs the independent "
    "reference at sf0.001 + r08's hash-exact fixture rows.",
)
def r09_bpe_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = load_merges(MERGES_PATH)
    tok = make_tokenize_udf(merges)
    docs = load_table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "source", F.size(tok(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    return with_counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
