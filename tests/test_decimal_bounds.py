"""The exact-decimal aggregation contract's domain boundary.

`functions/numeric.py` sums doubles through decimal(18,6) so Spark and
DuckDB hash-match bit-for-bit (decimal addition is associative; double
addition is not). The price is a domain bound: |x| < 1e12. Under
Spark 4's ANSI mode a value past the bound RAISES rather than silently
corrupting — this test pins that boundary behavior AND the verified
portable escape hatch (TRY_CAST NULL-skips identically on both
engines), which is the r10 migration path documented in SCALE.md.

If dsum() ever migrates to try_cast, the first test here goes red —
delete it then and promote the second into the main contract test.
"""

from __future__ import annotations

import duckdb
import pytest

from log2ck_spark.functions.numeric import dsum


def test_in_range_values_are_bit_exact_cross_engine(spark):
    df = spark.createDataFrame(
        [(1.25,), (2.5,), (999999.999999,)], "v double"
    )
    got = df.agg(dsum("v", "s")).collect()[0]["s"]
    want = duckdb.sql(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
        " FROM (VALUES (1.25),(2.5),(999999.999999)) t(v)"
    ).fetchone()[0]
    assert got == want


def test_out_of_range_value_raises_not_corrupts(spark):
    """ANSI mode: |x| >= 1e12 kills the query loudly. The contract is
    crash-don't-corrupt until the r10 try_cast migration lands."""
    df = spark.createDataFrame([(1e15,), (2.5,)], "v double")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.agg(dsum("v", "s")).collect()


def test_try_cast_escape_hatch_is_portable(spark):
    """The r10 migration target: try_cast NULL-skips out-of-range
    values IDENTICALLY on both engines, so the exact-decimal contract
    survives hostile magnitudes as a documented exclusion instead of
    a crash. If this ever breaks, the migration plan in SCALE.md is
    void — fix the plan before fixing this test."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1e15,), (2.5,), (3.5,)], "v double")
    got = df.agg(
        F.sum(F.col("v").try_cast("decimal(18,6)"))
        .cast("double")
        .alias("s")
    ).collect()[0]["s"]
    want = duckdb.sql(
        "SELECT CAST(SUM(TRY_CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
        " FROM (VALUES (1e15),(2.5),(3.5)) t(v)"
    ).fetchone()[0]
    assert got == want == 6.0
