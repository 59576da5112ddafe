"""Oracle parity tests (SURVEY §5.2 item 1): every registered tier-1
query must match its DuckDB oracle exactly at sf0.001; tier-2 queries
must run and return rows with a stable schema.

This is the same comparison the driver applies at sf0.01 — kept at
sf0.001 here so the full suite stays fast enough to run on every change.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded
from tools.check_oracle import duck_connect, run_one

from .conftest import SF_SMALL

_ensure_loaded()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    result = run_one(spark, duck, name, spec, SF_SMALL)
    assert result["ok"], f"{name}: {result.get('note')}"
