"""Vector primitives over ArrayType(FloatType) embedding columns.

Built-in higher-order functions only (zip_with / aggregate) — the dot
product runs JVM-side inside codegen; no Python, no UDF. Accumulation
is sequential left-to-right in both Spark and the DuckDB oracle, but we
still round reported cosines to a fixed precision to keep cross-engine
comparisons independent of FMA/association details.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to `decimals` (cross-engine stable)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)
