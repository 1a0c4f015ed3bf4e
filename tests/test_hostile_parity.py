"""NULL-group-key parity sentinels: query vs DuckDB oracle on the
hostile fixture (sf0.001 with NULLs injected into every GROUP-BY-able
key column — see oracle_harness.build_hostile_fixture).

The driver's fixtures carry zero NULL keys, so an engine/oracle
disagreement on NULL-key semantics stays green for rounds: Spark's
concat() nulls a whole rendered line where DuckDB's concat skips the
NULL argument (different synthesized corpora), equi-joins drop NULL
keys one side stitched around and the other didn't, ascending sorts
place NULL first on Spark and last on DuckDB (vote tie-breaks). All
three classes were found live in r8 — 10 of 169 oracle-bearing
queries diverged on this fixture before the corpus-completeness
predicate (ingest.CORPUS_COMPLETE_SQL), the null-safe HLL audit
joins, and knn's labeled-voters filter. This test pins exactly those
previously-red names plus the group-by sketch pair; the FULL registry
replay on the same fixture is `python scripts/driver_replica.py
--hostile` (run per round, recorded in PARITY.md).
"""

from __future__ import annotations

import pytest

from log2ck_spark.queries import ORACLES, QUERIES, load_all
from tests.oracle_harness import build_hostile_fixture, compare, run_oracle

load_all()

# 13 sentinels = the 10 names RED on this fixture before the r8 fixes
# (parse_monolog/accesslog/logfmt, filter_valid, enrich_constants,
# callback_transform, ingest_text_lines, ingest_tail_snapshot,
# sink_table, knn_classify) + raw_passthrough (never red, but its
# corpus and oracle carry the same completeness predicate, so it
# changed with them) + the two HLL consumers whose audit joins went
# null-safe (approx_distinct, sketch_hll) — every class represented.
SENTINELS = (
    "parse_monolog",
    "parse_accesslog",
    "parse_logfmt",
    "filter_valid",
    "enrich_constants",
    "callback_transform",
    "raw_passthrough",
    "ingest_text_lines",
    "ingest_tail_snapshot",
    "sink_table",
    "knn_classify",
    "approx_distinct",
    "sketch_hll",
)


@pytest.fixture(scope="module")
def hostile_dir():
    return build_hostile_fixture()


@pytest.mark.parametrize("name", SENTINELS)
def test_query_matches_oracle_on_null_keys(spark, hostile_dir, name):
    problems = compare(
        QUERIES[name](spark, hostile_dir),
        run_oracle(ORACLES[name], hostile_dir),
    )
    assert problems == [], (name, problems)
