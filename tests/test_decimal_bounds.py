"""The exact-decimal aggregation contract after the r10 try_cast migration.

`functions/numeric.py` sums doubles through decimal(18,6) so Spark and
DuckDB hash-match bit-for-bit (decimal addition is associative; double
addition is not). Pre-r10 the domain bound |x| < 1e12 was enforced by
CRASH under Spark 4's ANSI mode; as of r10 `dsum`/`davg` (and every
inline decimal-sum twin) go through TRY_CAST on BOTH engines, which
NULL-skips out-of-range values identically — the bound is now a
documented exclude-from-exact-aggregate semantic (SCALE.md), never a
dead query, and in-range results are bit-identical to the old chain.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import davg, dsum, oracle_davg, oracle_dsum


def test_in_range_values_are_bit_exact_cross_engine(spark):
    df = spark.createDataFrame(
        [(1.25,), (2.5,), (999999.999999,)], "v double"
    )
    got = df.agg(dsum("v", "s")).collect()[0]["s"]
    want = duckdb.sql(
        "SELECT CAST(SUM(TRY_CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
        " FROM (VALUES (1.25),(2.5),(999999.999999)) t(v)"
    ).fetchone()[0]
    assert got == want


def test_out_of_range_values_null_skip_not_crash(spark):
    """The r10 contract: a hostile 1e15 outlier is EXCLUDED from the
    exact sum — identically on both engines — instead of raising
    NUMERIC_VALUE_OUT_OF_RANGE. If this breaks, the SCALE.md domain
    contract is void."""
    df = spark.createDataFrame([(1e15,), (2.5,), (3.5,)], "v double")
    got = df.agg(dsum("v", "s")).collect()[0]["s"]
    want = duckdb.sql(
        f"SELECT {oracle_dsum('v', 's')}"
        " FROM (VALUES (1e15),(2.5),(3.5)) t(v)"
    ).fetchone()[0]
    assert got == want == 6.0


def test_davg_is_true_mean_of_included_values(spark):
    """davg divides by COUNT(try_cast(v)) — the mean of the values
    actually included, not of all rows — and the oracle twin agrees."""
    df = spark.createDataFrame([(1e15,), (2.0,), (4.0,)], "v double")
    got = df.agg(davg("v", "m")).collect()[0]["m"]
    want = duckdb.sql(
        f"SELECT {oracle_davg('v', 'm')}"
        " FROM (VALUES (1e15),(2.0),(4.0)) t(v)"
    ).fetchone()[0]
    assert got == want == 3.0


def test_all_excluded_group_is_null_on_both_engines(spark):
    """NULL sum / 0 count propagates NULL (not a divide-by-zero crash)
    identically on Spark ANSI and DuckDB — probed r10, pinned here."""
    df = spark.createDataFrame([(1, 1e15), (2, 3.0)], "g int, v double")
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(davg("v", "m")).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT g, {oracle_davg('v', 'm')}"
            " FROM (VALUES (1, 1e15),(2, 3.0)) t(g, v) GROUP BY g"
        ).fetchall()
    )
    assert got == want == {1: None, 2: 3.0}


def test_window_sum_try_cast_matches_oracle(spark):
    """The windowed running-sum twins (relational.py / relational3.py)
    migrated too: SUM(TRY_CAST(...)) OVER (...) agrees cross-engine
    and NULL-skips the outlier inside the frame."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 1.0), (2, 1e15), (3, 2.0)], "i int, v double"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    got = [
        r["s"]
        for r in df.select(
            F.sum(F.col("v").try_cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("s")
        ).collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(SUM(TRY_CAST(v AS DECIMAL(18,6))) OVER "
            "(ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS DOUBLE) FROM (VALUES (1, 1.0),(2, 1e15),(3, 2.0)) t(i, v)"
            " ORDER BY i"
        ).fetchall()
    ]
    assert got == want == [1.0, 1.0, 3.0]
