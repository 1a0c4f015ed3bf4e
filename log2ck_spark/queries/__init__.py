"""Central registry of named queries + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 registers here via :func:`register`;
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry. A query is a callable ``(spark, sf_dir) -> DataFrame``.
Queries whose semantics are not ANSI-SQL-expressible (LSH candidate
generation, hash-internal ops) register with ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every query module (idempotent) so the registry is full."""
    global _LOADED
    if _LOADED:
        return
    from log2ck_spark.queries import (  # noqa: F401
        behavior,
        curation,
        dedup,
        ingest,
        multimodal,
        pipelineops,
        relational,
        relational2,
        relational3,
        scaleops,
        similarity,
        streamq,
        textops,
        textops2,
        vectorops,
    )

    # SURVEY.md §2 C2 declares the near-dup contract under the name
    # `dedup_near`; alias it to the LSH implementation (same oracle).
    if "dedup_near" not in QUERIES:
        QUERIES["dedup_near"] = QUERIES["dedup_minhash_lsh"]
        ORACLES["dedup_near"] = ORACLES["dedup_minhash_lsh"]

    _LOADED = True
