"""The distributed blocked all-pairs cosine grid (_cosine_pairs_blocked)
— the beyond-broadcast-budget exact route q54 falls back to.

Contract pinned here:
- pair sets and rounded cosines are IDENTICAL to the broadcast-BLAS
  route at every block count (each unordered pair computed in exactly
  one grid cell: i<j inside diagonal cells, cross-product off them);
- hash-empty blocks (B > distinct hash values) are handled, not
  crashed on;
- the router prefers the grid past COSINE_BROADCAST_BUDGET_BYTES and
  the broadcast lane under it.
"""

from __future__ import annotations

import pytest

from batch_processing_system_spark.engine.io import load_table
from batch_processing_system_spark.queries.similarity import (
    COSINE_BROADCAST_BUDGET_BYTES,
    _cosine_pairs_blocked,
    q54_cosine_neardup,
)

from .conftest import SF_SMALL


def _pairs(df):
    return {(r["vec_id_a"], r["vec_id_b"], r["cos_sim"]) for r in df.collect()}


@pytest.fixture(scope="module")
def broadcast_pairs(spark):
    return _pairs(q54_cosine_neardup(spark, SF_SMALL))


class TestBlockedCosineGrid:
    @pytest.mark.parametrize("nblocks_budget", [
        # budgets engineered to land on small/medium/degenerate B
        (2 * 200 * 64 * 8) // 2,    # B=2: one diagonal pair dominates
        (2 * 200 * 64 * 8) // 7,    # B=7: mixed diagonal/off-diagonal
        1,                          # B=128 cap: most cells hash-empty
    ])
    def test_equals_broadcast_route(self, spark, broadcast_pairs, nblocks_budget):
        emb = load_table(spark, SF_SMALL, "embeddings")
        n = emb.count()
        got = _pairs(_cosine_pairs_blocked(emb, 0.45, n, 64, nblocks_budget))
        assert got == broadcast_pairs

    def test_router_prefers_grid_past_budget(self, spark, broadcast_pairs):
        # force the router decision (not the helper) through the tiny
        # budget: must still be the same relation
        got = _pairs(
            q54_cosine_neardup(spark, SF_SMALL, broadcast_budget_bytes=1)
        )
        assert got == broadcast_pairs

    def test_budget_constant_covers_driver_sfs(self, spark):
        # the driver's oracle corpora stay on the zero-shuffle
        # broadcast lane: their matrices are far below the budget
        emb = load_table(spark, SF_SMALL, "embeddings")
        n = emb.count()
        assert n * 64 * 8 < COSINE_BROADCAST_BUDGET_BYTES
