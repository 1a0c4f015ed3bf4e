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


def test_embedding_quantize_constant_vector_no_nulls(spark, tmp_path):
    sf_dir = _mini_embeddings(spark, tmp_path)
    rows = {r.vec_id: r for r in QUERIES["embedding_quantize"](spark, sf_dir).collect()}
    assert rows[2].q8 == [0, 0, 0, 0]
    assert rows[3].q8 == [0, 0, 0, 0]
    assert rows[2].lo == rows[2].hi == 0.7
    # non-constant rows still span the full code range
    assert min(rows[0].q8) == 0 and max(rows[0].q8) == 255
    for r in rows.values():
        assert all(c is not None for c in r.q8), r
