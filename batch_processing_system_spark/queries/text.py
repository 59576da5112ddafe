"""Text analysis operators (SURVEY §2.3 X4, U4) — the north-star
training-data-pipeline family: tokenization, quality scoring, language
ID, fingerprinting. All built-in higher-order/string functions —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register


@register(
    "q41",
    """
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word <> ''
    GROUP BY word
    """,
    doc="U4/X4 generator + word count — explode(split(text)); empty "
    "tokens filtered per §2.5 D9. The shuffle is on the word key "
    "(bounded vocabulary) after map-side partial counts, so it scales "
    "to any corpus size.",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
