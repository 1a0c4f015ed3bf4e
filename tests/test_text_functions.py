"""Unit tests for the shared text primitives (functions/text.py).

The regression that motivates this file: `shingles`/`hashed_shingles`
used `sequence(1, greatest(n-w+1, 0))`, and Spark's `sequence(1, 0)`
is DESCENDING ([1, 0]) — so ONE document shorter than the shingle
width crashed every dedup consumer with an array-index error.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.functions.text import (
    fingerprint,
    hamming64,
    hashed_shingles,
    shingles,
    tokens,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "one two"),  # shorter than every shingle width we use
            (3, "x"),
            (4, "a b c d e f g"),  # duplicate of 1
        ],
        "doc_id long, body string",
    )


def test_shingles_short_doc_returns_empty_array(spark):
    rows = (
        _docs(spark)
        .select("doc_id", shingles("body", w=3).alias("sh"))
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0].sh == ["a b c", "b c d", "c d e", "d e f", "e f g"]
    assert rows[1].sh == []  # 2 tokens < w=3: empty, not an exception
    assert rows[2].sh == []
    assert rows[3].sh == rows[0].sh


def test_hashed_shingles_short_doc_returns_empty_array(spark):
    rows = (
        _docs(spark)
        .select("doc_id", tokens("body").alias("toks"))
        .select("doc_id", hashed_shingles("toks", w=5).alias("hs"))
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows[0].hs) == 3  # 7 tokens, w=5 -> 3 positions
    assert rows[1].hs == []
    assert rows[2].hs == []
    assert rows[3].hs == rows[0].hs  # deterministic across rows


def test_shingle_width_equals_doc_length_boundary(spark):
    df = spark.createDataFrame([("a b c",)], "body string")
    (row,) = df.select(shingles("body", w=3).alias("sh")).collect()
    assert row.sh == ["a b c"]


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",)], "body string")
    fps = [r.fp for r in df.select(fingerprint("body").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_hamming64_basic(spark):
    df = spark.createDataFrame([(0, 7), (5, 5)], "a long, b long")
    rows = df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    assert [r.d for r in rows] == [3, 0]


def test_md5_helpers_match_oracle_twins(spark):
    """The shared portable-hash contract: Spark md5_bucket/md5_frac
    must agree with their generated DuckDB SQL twins on every key —
    one bulk comparison over 1000 ids (covers both hex widths)."""
    import duckdb

    from log2ck_spark.functions.numeric import (
        md5_bucket,
        md5_frac,
        oracle_md5_bucket,
        oracle_md5_frac,
    )

    ids = spark.range(1000).select(F.col("id").alias("k"))
    got = {
        r.k: (r.b8, r.b4, r.f8)
        for r in ids.select(
            "k",
            md5_bucket("k", 100).alias("b8"),
            md5_bucket("k", 100, hex_digits=4).alias("b4"),
            F.round(md5_frac("k"), 12).alias("f8"),
        ).collect()
    }
    sql = f"""
        SELECT k, {oracle_md5_bucket('k', 100)} AS b8,
               {oracle_md5_bucket('k', 100, hex_digits=4)} AS b4,
               ROUND({oracle_md5_frac('k')}, 12) AS f8
        FROM range(1000) t(k)
    """
    for k, b8, b4, f8 in duckdb.sql(sql).fetchall():
        assert got[k] == (b8, b4, f8), k
