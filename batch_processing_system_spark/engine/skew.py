"""Skew mitigation helpers (SURVEY §7 M5: "salt skewed keys").

AQE's skew-join splitting handles most hot-key joins automatically;
these helpers cover the two cases it doesn't:

- ``salted_aggregate``: two-phase aggregation for a groupBy whose key
  distribution is degenerate (one key = 30% of 100 TB). Phase 1
  aggregates on (key, salt) — spreading the hot key over N reducers —
  phase 2 combines the N partials. Only works for algebraic
  aggregates (sum/count/min/max), which is exactly what the helper's
  signature admits.
- ``salted_broadcast_left``: replicate-broadcast for a hot build side
  when the dimension is too big to broadcast whole but a few keys
  dominate (split hot keys out, broadcast them, union).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_expr(
    n_salts: int, cols: Sequence[str | Column] | None = None
) -> Column:
    """Salt = pmod(xxhash64(row id), n): hashing the id (VERDICT r10)
    spreads rows uniformly over the salt space even when the input is
    a single partition — raw ``id % n`` concentrates salts 0..k on
    small partitions because monotonically_increasing_id is
    partition-prefixed (id = partition_id << 33 | row_in_partition,
    so a short partition only ever emits the first few residues).
    The salt only has to be uniform-ish, never stable across runs:
    it is dropped after phase 1 and the phase-2 recombine is
    order-insensitive for the algebraic functions this module admits.

    ``cols`` (VERDICT r11 item 5): hash stable DATA columns instead of
    the row id — ``pmod(xxhash64(cols...), n)`` — so a retry of a
    failed stage re-derives IDENTICAL salts (monotonically_increasing_id
    is recompute-unstable; harmless for the order-insensitive
    recombine, but determinism under partial failure is stricter).
    Pick columns that are NOT functionally dependent on the group keys
    (e.g. an event/row id), otherwise every hot-key row hashes to one
    salt and the spread is lost."""
    if cols:
        exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
        return F.pmod(F.xxhash64(*exprs), F.lit(n_salts))
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. The result equals the direct
    ``df.groupBy(keys).agg(...)`` bit-for-bit for these algebraic
    functions (verified by property test), while the first shuffle
    spreads every key over ``n_salts`` reducers.

    ``salt_cols`` (VERDICT r11 item 5): derive the salt from stable
    data columns instead of the row id, making salts deterministic
    across stage retries too — see ``salt_expr``. Default unchanged
    (row-id hash): correct for the order-insensitive recombine, and
    imposes no column requirements on the input.
    """
    supported = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: {fn!r} is not algebraic-decomposable here")

    salted = df.withColumn(SALT_COL, salt_expr(n_salts, salt_cols))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    # phase 2: combine partials (count partials combine by SUM)
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, recombine[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def detect_hot_keys(
    df: DataFrame,
    key: str,
    skew_threshold: float = 16.0,
    top_k: int = 64,
    min_share: float | None = None,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list:
    """Data-driven hot-key selection — the r75 diagnostic feeding the
    r71 mitigation (VERDICT r11 item 2): profile ``key``'s frequency
    distribution and return the values whose skew factor
    ``count * n_keys / total`` (count relative to the uniform-key mean)
    meets ``skew_threshold``, heaviest first, capped at ``top_k``.

    The returned list is what ``salted_broadcast_left`` wants as
    ``hot_keys``: keys AQE's skew-join split may not see (sub-threshold
    partitions, unsupported plan shapes) but that would still serialize
    a reducer. Cost: one map-side-combinable count per key, one 2-column
    global row broadcast, and a top-k driver materialization — O(top_k),
    never O(n_keys). NULL keys are excluded: an equi-join matches NULL
    to nothing, so broadcasting it mitigates nothing (and
    salted_broadcast_left already routes NULLs to the cold branch).
    Threshold default 16x the uniform mean: mild skew is AQE's job;
    this helper targets degenerate keys, and at 16x a false positive
    costs only a pointlessly-broadcast dim row.

    ``min_share`` adds an ABSOLUTE criterion: a key holding that
    fraction of total mass is hot regardless of how many keys exist.
    The factor is relative to the uniform mean, so on a small key
    domain (9 keys at sf0.001) even a 30%-share key only profiles at
    ~4x — but the reducer it would serialize still holds 30% of the
    stage, which is exactly what broadcast mitigation is for. Share is
    also the criterion that is stable across scale factors: mass
    concentration, not key-domain size, is what hurts.

    ``sample_fraction`` (VERDICT r12 item 2): profile a seeded
    Bernoulli sample instead of the full input. At 100 TB the profile
    is run once on ``df.sample(0.01)`` and reused, not recomputed per
    query — a hot key's SHARE of sampled mass is an unbiased estimate
    of its true share, so the ``min_share`` criterion is
    sampling-stable (property-tested at planted shares 0.5/0.3 in
    tests/test_round13_fixes.py). Caveat — the RELATIVE
    ``skew_threshold`` criterion is not: rare keys with expected
    sampled count < 1 vanish from the sample, shrinking the observed
    key-domain ``n_keys`` and with it every key's skew factor
    (``count * n_keys / total``), so borderline relative-only hot keys
    can be missed under sampling. Pair sampling with ``min_share``,
    which is what actually predicts reducer serialization. ``seed``
    keeps the sample — and therefore the detected list and any plan
    built from it — deterministic across runs and stage retries.
    """
    if sample_fraction is not None and not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    freq = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = freq.agg(
        F.sum("_n").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    is_hot = (
        F.col("_n") * F.col("_keys")
        >= F.lit(float(skew_threshold)) * F.col("_total")
    )
    if min_share is not None:
        is_hot = is_hot | (
            F.col("_n") >= F.lit(float(min_share)) * F.col("_total")
        )
    hot = (
        freq.crossJoin(F.broadcast(tot))
        .filter(is_hot)
        .orderBy(F.desc("_n"), key)  # deterministic under the cap
        .limit(top_k)
    )
    # bounded-collect: at most top_k rows by construction (the limit
    # above), independent of input size
    return [row[key] for row in hot.collect()]


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: Sequence,
    how: str = "inner",
) -> DataFrame:
    """Join where ``right`` is too big to broadcast but a known set of
    hot keys dominates ``left``: the hot slice of right broadcasts,
    the cold remainder joins normally, results union. Equivalent to
    ``left.join(right, key, how)`` for inner/left joins.

    NULL-key handling: ``isin`` evaluates to NULL (not false) for NULL
    keys, which would drop NULL-key left rows from BOTH branches — a
    silent row loss under how='left'. The predicate therefore routes
    NULL keys into the cold branch, where a left join preserves them
    (they match nothing, same as the direct join)."""
    hot = F.col(key).isNotNull() & F.col(key).isin(list(hot_keys))
    hot_j = left.filter(hot).join(F.broadcast(right.filter(hot)), key, how)
    cold_j = left.filter(~hot).join(right.filter(~hot), key, how)
    return hot_j.unionByName(cold_j)


#: process-lifetime hot-key profiles, keyed by a caller-chosen token
#: (e.g. ``("events.k", sf_dir)``). Never invalidated within a process:
#: a skew profile describes the DATA, which is immutable for a given
#: source; a regenerated source should carry a new token (fold the
#: source fingerprint in if that matters).
_HOT_KEY_CACHE: dict[tuple, list] = {}


def detect_hot_keys_cached(
    cache_token: tuple, df: DataFrame, key: str, **kwargs
) -> list:
    """``detect_hot_keys`` with a process-lifetime memo (VERDICT r12
    item 2): the operational posture at 100 TB is "profile once —
    usually on a sample — and reuse", not "rescan the fact table
    inside every query". First call per token pays the (sampled)
    profile scan; every later call is a dict lookup, so a steady-state
    pipeline re-running the same skew-mitigated query pays detection
    exactly once per process. The returned list is copied so callers
    can't corrupt the cache."""
    tok = (key,) + tuple(cache_token)
    if tok not in _HOT_KEY_CACHE:
        _HOT_KEY_CACHE[tok] = detect_hot_keys(df, key, **kwargs)
    return list(_HOT_KEY_CACHE[tok])
