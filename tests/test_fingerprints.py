"""Planted tests for the round-6 fingerprinting/chunking/binning block
(r43 winnowing, r44 rolling median, r45 overlap chunks, r46 equi-depth
bins): the winnowing shared-run guarantee and rightmost tie-break, the
median 4dp rounding margin, chunk conservation/overlap, and the
±1-row equi-depth property."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from batch_processing_system_spark.queries.packing import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    r45_overlap_chunks,
)
from batch_processing_system_spark.queries.text import (
    WINNOW_K,
    WINNOW_W,
    r43_winnowing,
)
from batch_processing_system_spark.queries.wrangling import (
    r44_rolling_median,
    r46_equidepth_bins,
)
from tests.conftest import SF_SMALL


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def _winnow_reference(words, k=WINNOW_K, w=WINNOW_W):
    """Independent winnowing: explicit per-window argmin, rightmost tie."""
    grams = [
        hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()
        for i in range(len(words) - k + 1)
    ]
    n = len(grams)
    if n == 0:
        return set()
    sel = set()
    for j in range(max(n - w, 0) + 1):
        window = grams[j : j + w]
        mh = min(window)
        pos = max(i for i, h in enumerate(window) if h == mh) + j
        sel.add((mh, pos))
    return sel


class TestWinnowing:
    def test_matches_independent_reference(self, spark, tmp_path):
        texts = [
            "a b c d e f g h i j k l m n o p",
            "the quick brown fox jumps over the lazy dog again and again",
            "x y z w",                      # exactly k words -> 1 gram
            "x y z",                        # < k words -> no grams, no row
            "p q p q p q p q p q p q",      # repeated grams force ties
        ]
        _write_docs(spark, tmp_path, texts)
        got = {
            r["doc_id"]: (r["n_fp"], r["fp_digest"])
            for r in r43_winnowing(spark, str(tmp_path)).collect()
        }
        assert 3 not in got  # sub-k doc selects nothing
        for i, t in enumerate(texts):
            ref = _winnow_reference(t.split())
            if not ref:
                assert i not in got
                continue
            ordered = sorted(ref, key=lambda x: x[1])
            digest = hashlib.md5(
                ",".join(f"{h}:{p}" for h, p in ordered).encode()
            ).hexdigest()
            assert got[i] == (len(ref), digest), i

    def test_shared_run_guarantee(self, spark, tmp_path):
        # winnowing guarantees: a shared run of w+k-1 words yields at
        # least one shared fingerprint HASH between the two documents
        shared = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
        texts = [
            "alpha beta gamma delta " + shared + " epsilon zeta",
            "one two three four five six " + shared + " seven eight nine",
        ]
        _write_docs(spark, tmp_path, texts)
        a = _winnow_reference(texts[0].split())
        b = _winnow_reference(texts[1].split())
        assert {h for h, _ in a} & {h for h, _ in b}
        # and the engine agrees with the reference on both docs
        got = {
            r["doc_id"]: r["n_fp"]
            for r in r43_winnowing(spark, str(tmp_path)).collect()
        }
        assert got == {0: len(a), 1: len(b)}


class TestRollingMedianMargin:
    def test_4dp_boundary_distance(self, spark):
        # the ROUND(…,4) hash-matches only if no median sits at a
        # half-boundary where engine last-ulp interpolation could flip
        rows = (
            r44_rolling_median(spark, SF_SMALL)
            .select("med7")
            .collect()
        )
        assert rows
        for r in rows:
            frac = (abs(r["med7"]) * 10**4) % 1.0
            assert abs(frac - 0.5) > 1e-6, r["med7"]


class TestOverlapChunks:
    def test_conservation_and_overlap(self, spark, tmp_path):
        texts = [
            " ".join(f"w{i}" for i in range(100)),  # 100 tokens
            " ".join(f"v{i}" for i in range(CHUNK_SIZE)),  # exactly one chunk
            "solo",  # 1 token -> one short chunk
        ]
        _write_docs(spark, tmp_path, texts)
        rows = r45_overlap_chunks(spark, str(tmp_path)).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 0: chunks at strides 0,24,48,72 then the 96-token tail
        idxs = [r["chunk_idx"] for r in by_doc[0]]
        assert idxs == [0, 1, 2, 3]
        sizes = [r["n_tokens"] for r in by_doc[0]]
        assert sizes == [32, 32, 32, 28]  # last chunk short, not dropped
        # conservation: stride < size means token coverage is contiguous
        covered = set()
        for r in by_doc[0]:
            start = r["chunk_idx"] * CHUNK_STRIDE
            covered |= set(range(start, start + r["n_tokens"]))
        assert covered == set(range(100))
        assert [r["n_tokens"] for r in by_doc[1]] == [CHUNK_SIZE]
        assert [r["n_tokens"] for r in by_doc[2]] == [1]

    def test_digest_pins_content(self, spark, tmp_path):
        _write_docs(spark, tmp_path, ["a b c d e"])
        row = r45_overlap_chunks(spark, str(tmp_path)).collect()[0]
        assert row["chunk_digest"] == hashlib.md5(b"a b c d e").hexdigest()


class TestEquidepthBins:
    def test_bucket_sizes_differ_by_at_most_one(self, spark):
        rows = r46_equidepth_bins(spark, SF_SMALL).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        for t, bs in by_type.items():
            assert [b["bucket"] for b in bs] == list(range(10)), t
            sizes = [b["n_rows"] for b in bs]
            assert max(sizes) - min(sizes) <= 1, (t, sizes)
            # depth boundaries are ordered: bucket b's hi <= bucket b+1's lo
            for a, b in zip(bs, bs[1:]):
                assert a["hi"] <= b["lo"], (t, a, b)


class TestWinnowingRandomized:
    def test_fifty_random_docs_match_reference(self, spark, tmp_path):
        import random

        rng = random.Random(63)
        vocab = [f"t{i}" for i in range(30)]  # small vocab -> forced ties
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))
            for _ in range(50)
        ]
        _write_docs(spark, tmp_path, texts)
        got = {
            r["doc_id"]: (r["n_fp"], r["fp_digest"])
            for r in r43_winnowing(spark, str(tmp_path)).collect()
        }
        for i, t in enumerate(texts):
            ref = _winnow_reference(t.split())
            if not ref:
                assert i not in got
                continue
            ordered = sorted(ref, key=lambda x: x[1])
            digest = hashlib.md5(
                ",".join(f"{h}:{p}" for h, p in ordered).encode()
            ).hexdigest()
            assert got[i] == (len(ref), digest), i
