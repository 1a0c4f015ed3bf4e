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
