"""Python UDTFs (SURVEY §2.3 U4 — the generator surface beyond
explode/posexplode): Spark 4 ``@udtf`` classes, registered SQL-callable
so ``LATERAL chunk_text(...)`` works from both the DataFrame and SQL
entry points.

The flagship is context-window chunking — the pretraining-pipeline
step that splits each document into fixed-size token windows before
packing (/root/reference/README.md:63-66 lists the document corpus
this feeds). Per-row multi-out with a computed row count is exactly
what a UDTF expresses and a scalar UDF cannot.

Executor-side cost model: eval() runs per input row and yields
len(words)/size rows — pure generator, no buffering, so memory is
O(chunk size) per row regardless of document length. The row fan-out
happens inside the Python worker and lands in the normal Arrow batch
stream; downstream shuffles see only the (smaller) chunk rows.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_words int")
class ChunkText:
    """Split ``text`` into consecutive ``size``-word chunks.

    Word rule: split on single spaces, empties kept — mirrored 1:1 by
    DuckDB's string_split in the oracle, so chunk boundaries and word
    counts are bit-identical across engines."""

    def eval(self, text: str, size: int):  # noqa: D102 — Spark UDTF API
        if text is None or size is None or size < 1:
            return
        words = text.split(" ")
        for start in range(0, len(words), size):
            part = words[start : start + size]
            yield start // size, " ".join(part), len(part)


def register_udtfs(spark) -> list[str]:
    """Make every engine UDTF SQL-callable in this session; returns the
    registered names (idempotent — re-registration replaces)."""
    spark.udtf.register("chunk_text", ChunkText)
    return ["chunk_text"]
