"""Vector primitives over ArrayType(FloatType) embedding columns.

Built-in higher-order functions only (zip_with / aggregate) — the dot
product runs JVM-side inside codegen; no Python, no UDF. Accumulation
is sequential left-to-right in both Spark and the DuckDB oracle, but we
still round reported cosines to a fixed precision to keep cross-engine
comparisons independent of FMA/association details.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def finite_vec(vec: Column | str = "embedding") -> Column:
    """Corpus-membership predicate for every vector kernel: a usable
    embedding is non-NULL (--sparse: failed embedding jobs write NULL
    rows) with EVERY component finite (--nonfinite: crashed jobs also
    write NaN/Inf components, which would turn each norm, cosine,
    centroid, and fixed-point conversion into NaN — or, in the int64
    fixed-point path, an ANSI long-overflow crash). Skip, don't crash:
    the corpus is the clean rows, identically on both engines
    (`ORACLE_FINITE_VEC` is the DuckDB twin). F.exists is a codegen'd
    higher-order predicate — one pass over the array, no UDF."""
    c = F.col(vec) if isinstance(vec, str) else vec
    # x.isNull() must be an EXPLICIT disjunct: without it a NULL
    # component makes Spark's exists() return NULL (three-valued
    # logic) — dropping the row — while DuckDB's list_filter would
    # SKIP the NULL element and keep it (review finding, r10). A NULL
    # component is an unusable vector on both engines.
    return c.isNotNull() & ~F.exists(
        c,
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )


# DuckDB twin of finite_vec, interpolated into every vector oracle
# (never hand-copied — a drifted copy silently redefines one query's
# corpus): NULL-vector skip + every-component-present-and-finite.
# (isfinite(nan) and isfinite(±inf) are both false in DuckDB; the
# x IS NULL disjunct matches NULL components, which list_filter's
# predicate would otherwise exclude from the filtered list.)
ORACLE_FINITE_VEC = (
    "embedding IS NOT NULL AND len(list_filter(embedding,"
    " x -> x IS NULL OR NOT isfinite(x))) = 0"
)


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


def plane_signatures(planes: list[list[float]], bits: int):
    """Arrow-vectorized random-hyperplane signatures: one pandas UDF
    mapping an embedding column to `array<bigint>` of per-table bucket
    ids (bit b of table t = sign(v · plane[t*bits+b])).

    Why a UDF here when `dot` above is codegen'd: the signature needs
    n_tables×bits dot products PER ROW; as higher-order-function
    expressions those run interpreted per element (measured ~2.5 s for
    2k×32×256 at sf0.1). As one numpy matmul per Arrow batch the whole
    batch is a single BLAS `(n, dim) @ (dim, n_planes)` call — this is
    the textbook "vectorized Pandas UDF beats per-row expression" case,
    and at 10^10 vectors the matmul shape per partition is unchanged."""
    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_tables*bits)
    n_tables = P.shape[1] // bits
    weights = 1 << np.arange(bits, dtype=np.int64)  # (bits,)

    @pandas_udf("array<bigint>")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())  # (n, dim)
        signs = (mat @ P) > 0  # (n, n_tables*bits)
        sigs = signs.reshape(len(mat), n_tables, bits) @ weights  # (n, n_tables)
        return pd.Series(list(sigs))

    return _sig
