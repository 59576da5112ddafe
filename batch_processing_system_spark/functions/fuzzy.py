"""Jaro–Winkler similarity: pure-Python implementation + Arrow UDF.

Textbook Jaro (match window ⌊max/2⌋−1, transpositions halved) with the
Winkler prefix boost (p=0.1, prefix capped at 4, applied only when the
Jaro score exceeds 0.7) — the same parameterization DuckDB's native
``jaro_winkler_similarity`` uses, which is exactly the point: the r22
catalog query scores pairs with THIS implementation on the Spark side
and DuckDB's independent C++ implementation as the oracle, so the two
codebases cross-validate at 6dp on every candidate pair.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaro(s1: str, s2: str) -> float:
    n1, n2 = len(s1), len(s2)
    # either side empty scores 0 — including ("","") — matching
    # DuckDB's convention (RapidFuzz would score ("","") as 1)
    if not n1 or not n2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(n1, n2) // 2 - 1, 0)
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4,
                 boost_threshold: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler(x, y) for x, y in zip(a, b)])
