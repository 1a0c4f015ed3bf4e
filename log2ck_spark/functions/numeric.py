"""Numerically stable aggregates that hash-match an ANSI-SQL oracle.

Summing doubles is order-dependent; Spark's partial aggregation order
differs run-to-run and engine-to-engine, so ``SUM(double)`` can't be
compared bit-for-bit against DuckDB. We instead cast to an exact
decimal before summing (decimal addition is associative ⇒
order-independent and engine-independent), then cast the final result
back to double. The oracle mirrors the same cast chain:

    Spark : F.sum(col.try_cast("decimal(18,6)")).cast("double")
    DuckDB: CAST(CAST(SUM(TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)

decimal(18,6) holds |x| < 1e12 at 1e-6 resolution — ample for every
testdata column (prices < 1e6). TRY_CAST (r10 migration, SCALE.md)
NULL-skips out-of-range values IDENTICALLY on both engines instead of
raising NUMERIC_VALUE_OUT_OF_RANGE under Spark 4 ANSI mode — a hostile
1e15 outlier now becomes a documented exclude-from-exact-aggregate,
never a dead query, and in-range results are bit-identical to the old
plain-cast chain (probed + pinned in tests/test_decimal_bounds.py;
NULL/0 for an all-excluded group is NULL on both engines). Spark
widens the sum to decimal(28,6), DuckDB to decimal(38,6); both are
exact. The oracle's final conversion routes through VARCHAR because
DuckDB's direct decimal→double is NOT correctly rounded once the sum
needs more significant digits than a double holds (~16): probed r10,
CAST(1000000000341.190100::DECIMAL(38,6) AS DOUBLE) lands 1 ulp high
while the VARCHAR→DOUBLE path (strtod) and Spark's
BigDecimal.doubleValue are both correctly rounded — found live by the
--bignum hostile gate (12 queries diverged on sums ≥ 1e12).
Residual bound: the SUM itself can still overflow decimal(28,6)
(|Σ| ≥ 1e22 — ~1e10 rows at max magnitude); that raises loudly under
ANSI rather than corrupting. At 100 TB the decimal sum is still a
single-pass partial+final hash aggregate (no perf cliff vs double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(18,6)"


def finite(col: Column | str) -> Column:
    """Finite-observation predicate: non-NULL, not NaN, not ±Inf.

    Order statistics (percentiles, histogram bins) and derived integer
    buckets have no defensible placement for a non-finite measure, and
    the engines disagree where one sneaks in (DuckDB CAST(nan AS
    BIGINT) raises, quantile_cont counts NaN as the largest value
    while Spark's percentile excludes it) — so queries in those
    families define their observation set as the FINITE values,
    identically on both engines (--nonfinite gate). Oracle twin:
    ``isfinite(x)`` (NULL-safe: isfinite(NULL) is NULL → filtered).
    The exact-aggregate chain above needs no such filter — try_cast
    NULL-skips non-finite on both engines already."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
    )


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Out-of-range values (|x| >= 1e12) are NULL-skipped via try_cast —
    identical on both engines — instead of crashing under ANSI mode.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.try_cast(DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double.

    The count is over the try_cast column, so the mean stays a true
    mean of the INCLUDED (in-range) values; an all-excluded group is
    NULL/0 = NULL on both engines.

    Oracle twin: CAST(CAST(SUM(TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(18,6)))
    """
    c = F.col(col) if isinstance(col, str) else col
    d = c.try_cast(DECIMAL)
    out = F.sum(d).cast("double") / F.count(d)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str, alias: str) -> str:
    return f"CAST(CAST(SUM(TRY_CAST(CAST({expr} AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(TRY_CAST(CAST({expr} AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT(TRY_CAST(CAST({expr} AS VARCHAR) AS DECIMAL(18,6))) AS {alias}"
    )


def oracle_epoch_s(expr: str) -> str:
    """DuckDB twin of Spark's unix_timestamp(): epoch seconds with
    TRUNCATION TOWARD ZERO. Spark's unix_timestamp is integer long
    division of the microsecond tick (JVM `/`, truncating), so a
    pre-1970 fractional-second instant rounds UP toward zero:
    1969-12-31 23:59:59.999999 → 0, not floor's -1. The engine
    contract follows Spark's built-in (PARITY.md "epoch-second
    truncation"); every oracle that buckets, gaps, or range-frames on
    epoch seconds must mirror it with this helper. The previous
    spelling, CAST(floor(date_part('epoch', ts)) AS BIGINT), FLOORS —
    identical for epoch >= 0, one second low for every pre-1970
    fractional instant (found live by the --timewarp gate: 4 red, 5
    more latent). epoch_us is BIGINT end-to-end and DuckDB's `//` on
    BIGINT truncates, so this is exact at any representable timestamp
    — no DOUBLE epoch() anywhere (epoch()'s ulp passes 1 µs around
    year 2242, and floor(epoch()) starts misbucketing .999999 instants
    once the ulp passes 2 µs, ~year 2514). The window-start oracles'
    floor(epoch(ts)/width) spelling is a DIFFERENT, deliberate
    contract: Spark's window()/session_window() FLOOR the epoch (their
    TimeWindow math is floorMod), so those oracles mirror floor — and
    stay exact through the same ~2514 bound."""
    return f"(epoch_us({expr}) // 1000000)"


def oracle_round6(expr: str) -> str:
    """DuckDB twin of Spark's ROUND(double, 6) that stays portable at
    LARGE magnitudes. DuckDB's native ROUND(double, n) multiplies by
    10^n in double space, so past ~9e9 (where x*1e6 leaves the 2^53
    exact-integer range) it lands 1 ulp off Spark's BigDecimal-based
    round — found live by the --bignum gate (stats_moments /
    seasonal_hour_profile means over ~1e12-magnitude sums). The
    portable route mirrors what Spark's Round actually does: take the
    double's SHORTEST DECIMAL REPR (CAST to VARCHAR), round that digit
    string at scale 6 with HALF_UP (decimal cast), and convert back
    through the correctly-rounded string→double path. In-range small
    values are bit-identical to native ROUND. TRY_CAST so a value past
    decimal(38,6) yields NULL instead of killing the query."""
    return (
        f"CAST(CAST(TRY_CAST(CAST({expr} AS VARCHAR) AS DECIMAL(38,6))"
        f" AS VARCHAR) AS DOUBLE)"
    )


# --------------------------------------------------------------------------
# Engine-portable md5 bucketing (deterministic sampling / splits / streams)
# --------------------------------------------------------------------------
#
# The one hash contract every sampling/split/packing operator shares:
# md5 of the key's string form, first `hex_digits` hex chars as an
# integer. md5 (not xxhash64) because it is bit-identical across
# engines — the DuckDB oracle reproduces exact membership. Any change
# here changes SAMPLE MEMBERSHIP everywhere; the Spark and oracle
# twins below must stay in lockstep.


def md5_bucket(col: Column | str, n: int, hex_digits: int = 8) -> Column:
    """Deterministic bucket in [0, n): first `hex_digits` hex chars of
    md5(key) mod n."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, hex_digits), 16, 10)
        .cast("bigint")
        % n
    )


def md5_frac(col: Column | str, hex_digits: int = 8) -> Column:
    """Deterministic uniform fraction in [0, 1) from the same hash."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, hex_digits), 16, 10)
        .cast("bigint")
        / F.lit(float(16**hex_digits))
    )


def oracle_md5_bucket(expr: str, n: int, hex_digits: int = 8) -> str:
    """DuckDB twin of md5_bucket."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, "
        f"{hex_digits})) AS BIGINT) % {n}"
    )


def oracle_md5_frac(expr: str, hex_digits: int = 8) -> str:
    """DuckDB twin of md5_frac."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, "
        f"{hex_digits})) AS BIGINT) / {float(16 ** hex_digits)!r}"
    )
