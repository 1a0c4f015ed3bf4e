"""Focused tests for the r13 optimization internals.

1. io._read_parquet's per-process schema memo: a hit must reproduce
   the inferred schema exactly, and REWRITING the table (new mtime /
   size) must invalidate the entry — the memo may never serve a stale
   schema (that would be result caching, which the round forbids).
2. text_repetition_stats' zero-shuffle top-token kernel: the sorted-
   array run-length fold must equal the old explode+groupBy+max
   count on adversarial token layouts, and the NULL filters must
   reproduce the old inner-join row set.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from log2ck_spark import io as lio


@pytest.fixture()
def tmp_parquet(tmp_path):
    p = str(tmp_path / f"t_{uuid.uuid4().hex[:8]}.parquet")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_schema_memo_hit_and_rewrite_invalidation(spark, tmp_parquet):
    spark.range(5).selectExpr("id", "cast(id as string) AS s").write.parquet(
        tmp_parquet
    )
    first = lio._read_parquet(spark, tmp_parquet)
    assert set(first.columns) == {"id", "s"}
    # warm hit: same schema, same rows
    hit = lio._read_parquet(spark, tmp_parquet)
    assert hit.schema == first.schema
    assert hit.count() == 5
    # rewrite with a DIFFERENT schema: the memo must not serve stale
    spark.range(3).selectExpr(
        "id", "cast(id as double) AS v"
    ).write.mode("overwrite").parquet(tmp_parquet)
    second = lio._read_parquet(spark, tmp_parquet)
    assert set(second.columns) == {"id", "v"}
    assert second.count() == 3


def test_schema_memo_entries_are_metadata_only(spark, tmp_parquet):
    spark.range(2).write.parquet(tmp_parquet)
    lio._read_parquet(spark, tmp_parquet)
    from pyspark.sql.types import StructType

    assert all(isinstance(v, StructType) for v in lio._SCHEMA_CACHE.values())


def _reps_fixture(spark, tmp_path):
    rows = [
        (1, "a a a a"),  # single repeated token
        (2, "a b c d"),  # all distinct
        (3, "a b a b a"),  # interleaved: top=a(3), sort groups runs
        (4, "x"),  # single token
        (5, "q w q w"),  # tie at 2
        (6, ""),  # split('') -> [''] : one empty token
        (7, None),  # NULL text: dropped (old inner join)
        (None, "z z"),  # NULL doc_id: dropped (old inner join)
        (8, "m n m n n m n"),  # top=n(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS INT) AS n_chars",
    )
    sf = str(tmp_path / "sf_reps")
    df.write.parquet(f"{sf}/documents.parquet")
    return sf


def test_repetition_top_cnt_matches_explode_groupby(spark, tmp_path):
    from log2ck_spark.queries import load_all
    from log2ck_spark.queries.textops3 import text_repetition_stats

    load_all()
    sf = _reps_fixture(spark, tmp_path)
    got = {
        r["doc_id"]: r for r in text_repetition_stats(spark, sf).collect()
    }
    # NULL doc_id / NULL text rows must be absent (old join semantics)
    assert set(got) == {1, 2, 3, 4, 5, 6, 8}
    # independent recomputation of the top-token fraction via the old
    # explode + groupBy + max shape
    d = spark.read.parquet(f"{sf}/documents.parquet")
    old = {
        r["doc_id"]: r["top_cnt"]
        for r in (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
            .groupBy("doc_id", "t")
            .agg(F.count("*").alias("cnt"))
            .groupBy("doc_id")
            .agg(F.max("cnt").alias("top_cnt"))
            .filter(F.col("doc_id").isNotNull())
            .collect()
        )
    }
    for doc_id, row in got.items():
        n_tokens = row["n_tokens"]
        assert row["top_token_frac"] == pytest.approx(
            old[doc_id] / n_tokens
        ), f"doc {doc_id}"
    # spot-check the adversarial layouts explicitly
    assert got[1]["top_token_frac"] == pytest.approx(1.0)
    assert got[2]["top_token_frac"] == pytest.approx(0.25)
    assert got[3]["top_token_frac"] == pytest.approx(3 / 5)
    assert got[4]["top_token_frac"] == pytest.approx(1.0)
    assert got[5]["top_token_frac"] == pytest.approx(0.5)
    assert got[8]["top_token_frac"] == pytest.approx(4 / 7)


def test_array_taint_keeps_generator_out_of_filters(spark):
    """array_compute_once must stop the optimizer's inferred generator
    filter from re-inlining the winnow fingerprint pipeline (the shape
    that measured 3.8x on the posting stage) — no md5 may appear inside
    any Filter node of the tainted posting plan — while producing
    value-identical rows to the bare explode."""
    from pyspark.sql import functions as F

    from log2ck_spark.functions.plan import array_compute_once
    from log2ck_spark.queries.textops3 import _winnow_sets

    sf = "/root/testdata/sf0.001"
    sets = _winnow_sets(spark, sf)
    tainted = sets.select(
        "doc_id", F.explode(array_compute_once(F.col("fp"))).alias("h")
    )
    plain = sets.select("doc_id", F.explode("fp").alias("h"))
    plan = tainted._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith(("+- Filter", ":- Filter", "Filter")):
            assert "md5" not in line, (
                "winnow fingerprint re-evaluated inside a Filter: " + line[:200]
            )
    agg = lambda df: df.groupBy().agg(  # noqa: E731
        F.count("*"), F.sum(F.hash("doc_id", "h"))
    ).collect()
    assert agg(tainted) == agg(plain)
