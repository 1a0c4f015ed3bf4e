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
        featurize,
        ingest,
        multimodal,
        packing,
        pipelineops,
        relational,
        relational2,
        relational3,
        scaleops,
        semantic,
        similarity,
        sketches,
        streamq,
        textops,
        textops2,
        textops3,
        timeseries,
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
    # r11 window — pinned in FULL (50 names) for determinism. Three
    # groups; see ROTATION.md "Round 11 window" for the accounting.
    #
    # Group 1 — the 24-name code-changed queue carried out of r10
    # (names whose code/oracle changed AFTER their latest driver row;
    # the pin rule says these re-prove first). 7 timewarp
    # (epoch-truncation contract), 9 sparse (NULL-embedding /
    # NULLS FIRST / NULL-measure contracts), 2 blank (CSV round-trip,
    # logfmt grammar), 5 nonfinite (finite_vec / finite-observation
    # contracts), 1 jumbo (agg_map_sum per-entry try_cast):
    "rate_counter",
    "agg_latest_by_key",
    "iat_stats",
    "sessionize_gap",
    "runs_encode",
    "stream_stream_join",
    "zorder_layout",
    "similarity_topk",
    "similarity_lsh",
    "similarity_ivf",
    "knn_classify",
    "dedup_embedding_lsh",
    "embedding_kmeans",
    "dedup_semantic",
    "window_ntile",
    "sketch_quantile_hist",
    "ingest_csv",
    "parse_logfmt",
    "anomaly_ewma",
    "dedup_embedding",
    "embedding_normalize",
    "embedding_quantize",
    "percentile_agg",
    "agg_map_sum",
    # + cube_rollup joined the queue mid-r11: the --empty hostile gate
    # found Spark's ROLLUP emits no rows over empty input where
    # ANSI/DuckDB emit the grand-total row; the oracle now carries
    # HAVING COUNT(*) > 0 (a non-empty-input no-op), so its r10 row
    # predates the oracle text. pii_scrub was displaced to the r12
    # deferral list to keep the window at 50.
    "cube_rollup",
    # Group 2 — new this round (never driver-checked): the exact-sum
    # domain-contract audit query (VERDICT r10 item 5).
    "agg_sum_audited",
    # Group 3 — stale-evidence drain (VERDICT r10 item 1): all 14
    # remaining r6-latest names, then the 11 stalest r7 names that
    # fit. 9 r7 names defer to r12 (listed in ROTATION.md with
    # rationale; they become the unique stalest tier next round, so
    # the automatic order surfaces them first even unpinned).
    "datetime_funcs",
    "distinct_exact",
    "join_semi_anti",
    "project_columns",
    "sample_hash_bernoulli",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_within",
    "string_match",
    "topk_per_group",
    "topk_per_group_twophase",
    "tpch_q4_order_priority",
    "window_rank",
    "heavy_hitters",
    "stream_dedup",
    "text_lang_id",
    "text_token_count",
    "text_quality_score",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier",
    "ttl_expire",
)


def _last_checked_rounds() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a CORRECTNESS_r{N}.json row, whether
    that latest row FAILED). A row — green or failed — is external
    evidence for staleness ordering, but a FAILED latest row must be
    re-surfaced ahead of green ones (a failed check is not evidence of
    health). Failed means an exception (err) OR any recorded mismatch
    (rows/schema/hash False with err null) — a silent value mismatch
    deprioritized as "green" would evade re-checking for rounds.
    Missing/unreadable files are simply skipped."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    last: dict[str, tuple[int, bool]] = {}
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
        for name, row in rows.items():
            err = isinstance(row, dict) and (
                row.get("err") not in (None, "no_oracle")
                or any(
                    row.get(k) is False
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            )
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, err)
    return last


def _apply_rotation() -> None:
    """Reorder the registries so the driver's 50-name check window
    lands on the names with the weakest external evidence. Priority:
    (0) latest driver row ERRORED — a known-red external row is the
    worst standing evidence and must re-verify first, (1) never
    driver-checked — no external row yet, but local oracle parity is
    green, (2) green — then stalest round, then registration order.
    (The registry outgrew the 50-name window in r4, so ranking
    errored above never-checked is what keeps a failed check from
    waiting behind a long tail of new operators.) Opt-out with
    LOG2CK_SPARK_ROTATION=0 for deterministic library import order
    outside this benchmark checkout (no CORRECTNESS artifacts present
    is equally deterministic: registration order is preserved)."""
    import os as _os

    if _os.environ.get("LOG2CK_SPARK_ROTATION", "1") == "0":
        return
    last = _last_checked_rounds()
    reg_index = {n: i for i, n in enumerate(QUERIES)}

    def _key(n: str):
        rec = last.get(n)
        if rec is None:
            rank = 1  # never checked: ahead of green, after errored
        elif rec[1]:
            rank = 0  # latest check errored: highest priority
        else:
            rank = 2  # green: stalest first within
        return (rank, rec[0] if rec else -1, reg_index[n])

    pinned = [n for n in ROTATION_FIRST if n in QUERIES]
    rest = sorted((n for n in QUERIES if n not in set(pinned)), key=_key)
    ordered = pinned + rest
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
