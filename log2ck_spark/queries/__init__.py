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
        textops3,
        vectorops,
    )

    # SURVEY.md §2 C2 declares the near-dup contract under the name
    # `dedup_near`; alias it to the LSH implementation (same oracle).
    if "dedup_near" not in QUERIES:
        QUERIES["dedup_near"] = QUERIES["dedup_minhash_lsh"]
        ORACLES["dedup_near"] = ORACLES["dedup_minhash_lsh"]

    _apply_rotation()
    _LOADED = True


# The round driver hash-checks only the FIRST 50 names it sees from
# ``__spark_entry__.queries()``; with 100+ registered queries, coverage
# has to rotate. Ordering is automatic: `_apply_rotation` reads the
# driver's own CORRECTNESS_r*.json records and surfaces never-checked
# names first, then the stalest (oldest last-checked round), so every
# round maximizes fresh external evidence with no manual list edits.
# ROTATION_FIRST remains as a manual PIN on top of the automatic order
# (e.g. re-surfacing a query whose oracle was just upgraded); see
# ROTATION.md. Python dicts preserve insertion order, so a plain
# rebuild is enough.
ROTATION_FIRST: tuple[str, ...] = (
    "dedup_near",
    # re-check: newly oracle-backed this round (was rows-only in r1/r2)
    "dedup_simhash",
    # similarity / vectors
    "similarity_topk",
    "similarity_lsh",
    "embedding_normalize",
    "embedding_quantize",
    "embedding_dim_stats",
    # streaming
    "stream_tumbling_agg",
    "stream_dedup",
    # text analysis
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "token_count_bpe",
    "pii_scrub",
    "error_rate_alert",
    "tfidf_top_terms",
    "bm25_score",
    "bigram_stats",
    "doc_entropy",
    "stratified_sample",
    "heavy_hitters",
    # scale patterns
    "agg_skew_salted",
    "join_bucketed_colocated",
    # relational2 tail (first 4 set-ops were checked in r1/r2)
    "cube_rollup",
    "join_semi_anti",
    "percentile_agg",
    "sliding_window_agg",
    "from_json_struct",
    "ingest_json_lines",
    "tpch_q6_forecast_revenue",
    "tpch_q5_local_supplier",
    "tpch_q4_order_priority",
    "tpch_q18_large_orders",
    # relational3: the rest of TPC-H + window extensions
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_share",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_join",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q20_excess_supplier",
)


def _last_checked_rounds() -> dict[str, int]:
    """name -> latest round number whose CORRECTNESS_r{N}.json contains
    a row for it (any row, green or err, counts as external evidence
    that round). Missing/unreadable files are simply skipped."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = _json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = max(last.get(name, -1), rnd)
    return last


def _apply_rotation() -> None:
    last = _last_checked_rounds()
    reg_index = {n: i for i, n in enumerate(QUERIES)}
    pinned = [n for n in ROTATION_FIRST if n in QUERIES]
    rest = sorted(
        (n for n in QUERIES if n not in set(pinned)),
        key=lambda n: (last.get(n, -1), reg_index[n]),
    )
    ordered = pinned + rest
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
