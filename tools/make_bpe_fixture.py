"""Train the committed BPE tokenizer artifact and pin the r08 oracle.

Trains merges on the sf0.01 documents corpus (deterministic: tie-break
by lexicographic pair) and writes them to
``batch_processing_system_spark/fixtures/bpe/merges.txt`` — the
tokenizer file the r08/r09 catalog queries load, committed like the
multimodal fixtures. Then prints the DuckDB VALUES oracle for
``r08_bpe_tokens``, computed by the INDEPENDENT implementation in
``tests/_bpe_reference.py`` (not the engine tokenizer under test).

Rerun + repaste whenever the fixture texts or training corpus change:

    python tools/make_bpe_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.functions.bpe import (
    dump_merges,
    load_merges,
    train_bpe_on_corpus,
)
from batch_processing_system_spark.queries.tokenize import FIXTURE_TEXTS, MERGES_PATH

TRAIN_SF = "/root/testdata/sf0.01"
NUM_MERGES = 200


def main() -> None:
    spark = get_spark("make-bpe-fixture", shuffle_partitions=8)
    docs = load_table(spark, TRAIN_SF, "documents")
    merges = train_bpe_on_corpus(docs, num_merges=NUM_MERGES)
    os.makedirs(os.path.dirname(MERGES_PATH), exist_ok=True)
    with open(MERGES_PATH, "w", encoding="utf-8") as fh:
        fh.write(dump_merges(merges))
    print(f"wrote {len(merges)} merges -> {MERGES_PATH}")

    # Pin the oracle with the INDEPENDENT apply, reading the artifact
    # back from disk exactly as the query will.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from _bpe_reference import ref_tokenize  # noqa: E402

    committed = load_merges(MERGES_PATH)
    rows = []
    for text_id, text in FIXTURE_TEXTS:
        toks = ref_tokenize(text, committed)
        joined = " ".join(toks).replace("'", "''")
        rows.append(
            f"    ({text_id}, CAST({len(toks)} AS BIGINT), '{joined}')"
        )
    print("_BPE_ORACLE = \"\"\"\n    SELECT * FROM (VALUES")
    print(",\n".join(rows))
    print("    ) AS t(text_id, n_tokens, tokens)\n\"\"\"")


if __name__ == "__main__":
    main()
