"""Numerically stable aggregates that hash-match an ANSI-SQL oracle.

Summing doubles is order-dependent; Spark's partial aggregation order
differs run-to-run and engine-to-engine, so ``SUM(double)`` can't be
compared bit-for-bit against DuckDB. We instead cast to an exact
decimal before summing (decimal addition is associative ⇒
order-independent and engine-independent), then cast the final result
back to double. The oracle mirrors the same cast chain:

    Spark : F.sum(col.cast("decimal(18,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)

decimal(18,6) holds |x| < 1e12 at 1e-6 resolution — ample for every
testdata column (prices < 1e6). Spark widens the sum to decimal(28,6),
DuckDB to decimal(38,6); both are exact, and the final double cast of
the same exact value is identical. At 100 TB the decimal sum is still a
single-pass partial+final hash aggregate (no perf cliff vs double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(18,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double.

    Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
