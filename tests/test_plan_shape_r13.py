"""r13 optimization-round plan-shape pins.

The `filter_compute_once` guard (functions/plan.py) exists to stop
PushDownPredicates from re-inlining expensive derived expressions into
a filter below the projection that computes them. The first r13
wrapper (`WHEN rand() >= 0 THEN cond ELSE false` inside the filter)
was silently optimized away by Spark 4.1 — `rand() >= 0` constant-
folds to true and filter-side non-determinism never blocked Project
pushdown in the first place — and the original version of this test
was vacuous (it looked for a `_valid` substring that pushdown
substitution removes). These pins are written against the FAILURE
plan shape: they assert the expensive expression appears in no Filter
node at all, and that the taint survived optimization, so a future
Spark rule that learns to fold the arithmetic taint fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.functions.plan import filter_compute_once, nonpushable


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _filter_lines(plan: str) -> "list[str]":
    return [
        ln
        for ln in plan.splitlines()
        if ln.lstrip("+- :").startswith("Filter")
    ]


def test_parse_valid_filter_not_pushed_below_projection(spark, sf_dir):
    from log2ck_spark.parse import parse_lines, split_valid
    from log2ck_spark.queries.ingest import monolog_lines

    valid, _dead = split_valid(parse_lines(monolog_lines(spark, sf_dir)))
    plan = _optimized(valid)
    # The regex parse pipeline must be evaluated by exactly one
    # Project, never by a Filter: any Filter containing the rewrite
    # regex means pushdown substituted _valid's definition and the
    # pipeline runs twice per row.
    offending = [ln for ln in _filter_lines(plan) if "regexp_replace" in ln]
    assert not offending, (
        "valid-side filter was pushed below the parse projection; "
        f"the regex pipeline will run twice per row:\n{offending[0][:400]}"
    )
    # ... and the guard itself must still be present: if a future
    # optimizer folds the taint, the filter collapses into a pushable
    # deterministic predicate again.
    assert "rand(" in plan, "filter_compute_once taint was optimized away"


def test_verify_jaccard_filter_not_duplicating_intersect(spark, sf_dir):
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    plan = _optimized(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    offending = [ln for ln in _filter_lines(plan) if "array_intersect" in ln]
    assert not offending, (
        "jaccard threshold filter was pushed below the verify "
        "projection; array_intersect will run twice per candidate:\n"
        f"{offending[0][:400]}"
    )
    assert "rand(" in plan, "filter_compute_once taint was optimized away"


def test_ngram_jaccard_filter_not_duplicating_intersect(spark, sf_dir):
    # Same pin as dedup_minhash_lsh's, for the OTHER _verify_jaccard
    # consumer (r14, the verdict's remaining-taint-sites item):
    # dedup_ngram_jaccard — and through _jaccard_edges the
    # dedup_clusters kernel — must never pay array_intersect twice.
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    plan = _optimized(QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
    offending = [ln for ln in _filter_lines(plan) if "array_intersect" in ln]
    assert not offending, (
        "jaccard threshold filter was pushed below the verify "
        "projection; array_intersect will run twice per candidate:\n"
        f"{offending[0][:400]}"
    )
    assert "rand(" in plan, "filter_compute_once taint was optimized away"


def test_dedup_embedding_cosine_not_duplicated(spark, sf_dir):
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    plan = _optimized(QUERIES["dedup_embedding"](spark, sf_dir))
    # cosine() expands to aggregate(zip_with(...)) higher-order calls
    offending = [ln for ln in _filter_lines(plan) if "zip_with" in ln]
    assert not offending, (
        "cosine tau filter was pushed below its projection; the "
        f"64-dim dot product runs twice per pair:\n{offending[0][:400]}"
    )


def test_filter_compute_once_blocks_project_pushdown(spark):
    # Synthetic regression pin for the mechanism itself, independent
    # of any query: an expensive derived column + threshold filter.
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("d")
    )
    guarded = filter_compute_once(df, F.col("d") >= 3)
    plan = _optimized(guarded)
    offending = [ln for ln in _filter_lines(plan) if "% 7" in ln]
    assert not offending, (
        f"taint failed to block pushdown through Project:\n{plan}"
    )
    assert "rand(" in plan


def test_nonpushable_preserves_values(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("d")
    )
    plain = df.filter(F.col("d") >= 3)
    guarded = df.filter(nonpushable(F.col("d") >= 3))
    helper = filter_compute_once(df, F.col("d") >= 3)
    expect = sorted(r.id for r in plain.collect())
    assert sorted(r.id for r in guarded.collect()) == expect
    assert sorted(r.id for r in helper.collect()) == expect


def test_filter_compute_once_null_semantics(spark):
    # cond=null rows must be dropped exactly like a bare filter.
    df = spark.range(12).select(
        F.when(F.col("id") % 3 != 0, F.col("id") % 2 == 0).alias("c"),
        F.col("id"),
    )
    expect = sorted(r.id for r in df.filter(F.col("c")).collect())
    got = sorted(r.id for r in filter_compute_once(df, F.col("c")).collect())
    assert got == expect
