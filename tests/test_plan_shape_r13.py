"""r13 optimization-round plan-shape pins.

The `nonpushable` filter guard (functions/plan.py) exists to stop
PushDownPredicates from re-inlining expensive derived expressions into
the filter below their projection (measured 1.7-2.9x on the parse
family, ~1.12x on minhash verify — see OPTIMIZATION_r13.md). These
tests pin the optimized plan shape so a future refactor that silently
reintroduces the duplication fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.functions.plan import nonpushable


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_parse_valid_filter_not_pushed_below_projection(spark, sf_dir):
    from log2ck_spark.parse import parse_lines, split_valid
    from log2ck_spark.queries.ingest import monolog_lines

    valid, _dead = split_valid(parse_lines(monolog_lines(spark, sf_dir)))
    plan = _optimized(valid)
    # The Filter line must reference the projected boolean, not an
    # inlined copy of the parse pipeline: no regexp_replace inside
    # any Filter node.
    for ln in plan.splitlines():
        if ln.lstrip().startswith(("Filter", "+- Filter")) and "_valid" in ln:
            assert "regexp_replace" not in ln, (
                "valid-side filter was pushed below the parse "
                "projection; the regex pipeline will run twice per row"
            )


def test_verify_jaccard_filter_not_duplicating_intersect(spark, sf_dir):
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    plan = _optimized(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    filter_lines = [
        ln for ln in plan.splitlines() if ln.lstrip().startswith("Filter")
        or "+- Filter" in ln
    ]
    assert not any("array_intersect" in ln for ln in filter_lines), (
        "jaccard threshold filter was pushed below the verify "
        "projection; array_intersect will run twice per candidate"
    )


def test_nonpushable_preserves_values(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("d")
    )
    plain = df.filter(F.col("d") >= 3)
    guarded = df.filter(nonpushable(F.col("d") >= 3))
    assert sorted(r.id for r in plain.collect()) == sorted(
        r.id for r in guarded.collect()
    )
