"""Declared oracle query catalog (SURVEY.md §2.4).

Every operator in the SURVEY §2 inventory compiles to one or more named
queries here. Each query is a (Spark builder, optional DuckDB oracle SQL)
pair; the driver executes both at sf0.01 and hash-compares. Tier-2
queries (float accumulation / LSH randomness) register ``oracle=None``
and get a rows-only check.

Import side effects register everything; ``queries()`` / ``oracle_sql()``
are re-exported by the repo-root ``__spark_entry__.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => tier-2 rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules (registration is an import side effect)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        relational,
        aggregates,
        windows,
        setops,
        scalar,
        nested,
        temporal,
        text,
        similarity,
        pipeline_queries,
        extras,
        analytics,
        curation,
        packing,
        retrieval,
        media,
        wrangling,
        graphs,
        layout,
        tokenize,
        tpch,
        streamrows,
    )

    _LOADED = True
