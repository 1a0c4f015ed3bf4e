"""Edge-case regressions for vector operators: constant vectors used
to turn every quantization code into NaN->null (div by zero range)."""

from __future__ import annotations

from log2ck_spark.queries import QUERIES, load_all

load_all()


def _mini_embeddings(spark, tmp_path):
    """A tiny embeddings table with a constant vector (row 2)."""
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.5, 1.0, 0.25], 0),
            (1, [-1.0, 1.0, 0.0, 0.5], 1),
            (2, [0.7, 0.7, 0.7, 0.7], 0),  # constant: hi == lo
            (3, [0.0, 0.0, 0.0, 0.0], 1),  # constant at zero
        ],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_embedding_quantize_constant_vector_no_nulls(spark, tmp_path):
    sf_dir = _mini_embeddings(spark, tmp_path)
    rows = {r.vec_id: r for r in QUERIES["embedding_quantize"](spark, sf_dir).collect()}
    # constant vectors: every code 0 (lo==hi carries the value)
    assert rows[2].q8_digest == _md5("0,0,0,0") and rows[2].q8_sum == 0
    assert rows[3].q8_digest == _md5("0,0,0,0") and rows[3].q8_sum == 0
    assert rows[2].lo == rows[2].hi == 0.7
    # non-constant row 0: [0.0, 0.5, 1.0, 0.25] -> codes [0, 128, 255, 64]
    assert rows[0].q8_digest == _md5("0,128,255,64")
    assert rows[0].q8_sum == 0 + 128 + 255 + 64


def test_corpus_dim_skips_leading_null_embedding(spark):
    """r6 advisor finding: _corpus_dim probed row 1 unconditionally, so
    a corpus whose first row carried a NULL/empty embedding silently
    got the 64-dim fixture fallback even when the real corpus was
    another width — wrong hyperplane dimensionality, runtime dot-
    product errors. The probe must find the first NON-degenerate row
    and reserve the fallback for all-degenerate corpora."""
    import pyspark.sql.functions as F

    from log2ck_spark.queries.similarity import _TESTDATA_DIM, _corpus_dim

    df = spark.createDataFrame(
        [(0, None), (1, []), (2, [1.0] * 8), (3, [2.0] * 8)],
        "vec_id long, v array<double>",
    )
    assert _corpus_dim(df) == 8
    # All-degenerate corpus: fallback, never an exception.
    assert _corpus_dim(df.filter(F.col("vec_id") < 2)) == _TESTDATA_DIM
    assert _corpus_dim(df.limit(0)) == _TESTDATA_DIM


def test_finite_vec_null_component_parity_with_oracle(spark, tmp_path):
    """A vector with a NULL COMPONENT (not a NULL vector) must be
    excluded by finite_vec on BOTH engines. r10 review finding: the
    original Spark predicate's exists() returned NULL for such a row
    (three-valued logic — dropped) while the oracle's list_filter
    SKIPPED the NULL element (kept) — a silent corpus-definition
    divergence in the very predicate pair documented as identical.
    Both sides now spell the NULL-component disjunct explicitly."""
    import duckdb

    from log2ck_spark.functions.vectors import ORACLE_FINITE_VEC, finite_vec

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0], 0),
            (1, [1.0, None, 3.0], 0),     # NULL component
            (2, None, 0),                 # NULL vector
            (3, [float("nan"), 1.0, 1.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    path = str(tmp_path / "embeddings.parquet")
    df.write.parquet(path)
    spark_kept = sorted(
        r.vec_id
        for r in spark.read.parquet(path).where(finite_vec()).collect()
    )
    duck_kept = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT vec_id FROM read_parquet('{path}/*.parquet')"
            f" WHERE {ORACLE_FINITE_VEC}"
        ).fetchall()
    )
    assert spark_kept == duck_kept == [0]
