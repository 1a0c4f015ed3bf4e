"""The mergeable-sketch property, tested directly: building a sketch
on each of two disjoint corpus shards and MERGING (cell-wise add for
counters, register-wise MAX for HLL) must equal the sketch built on
the full corpus. This is the exact property that makes the 100 TB
story a two-stage aggregation — Spark's partial/final agg IS the
merge, so the property holding over an arbitrary split is what the
plans rely on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import md5_bucket
from log2ck_spark.functions.text import tokens
from log2ck_spark.io import tbl

SF = "/root/testdata/sf0.001"


def _cms_cells(df):
    toks = df.select(F.explode(tokens("text")).alias("tok"))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                md5_bucket(F.concat(F.col("tok"), F.lit(f":{j}")), 256).alias(
                    "col"
                ),
            )
            for j in range(4)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("c"))
    )


def test_count_min_cells_merge_by_addition(spark):
    d = tbl(spark, SF, "documents")
    full = {(r.j, r.col): r.c for r in _cms_cells(d).collect()}
    half_a = _cms_cells(d.filter(F.col("doc_id") % 2 == 0))
    half_b = _cms_cells(d.filter(F.col("doc_id") % 2 == 1))
    merged = (
        half_a.unionAll(half_b)
        .groupBy("j", "col")
        .agg(F.sum("c").alias("c"))
    )
    got = {(r.j, r.col): r.c for r in merged.collect()}
    assert got == full


def _hll_registers(df):
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    rest = F.shiftright(F.col("h"), 9).cast("bigint")
    rho = F.when(rest == 0, F.lit(52)).otherwise(52 - F.length(F.bin(rest)))
    return (
        df.select(h.alias("h"))
        .select((F.col("h") % 512).alias("bucket"), rho.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("m_rho"))
    )


def test_hll_registers_merge_by_max(spark):
    ev = tbl(spark, SF, "events")
    full = {(r.bucket): r.m_rho for r in _hll_registers(ev).collect()}
    merged = (
        _hll_registers(ev.filter(F.col("event_id") % 2 == 0))
        .unionAll(_hll_registers(ev.filter(F.col("event_id") % 2 == 1)))
        .groupBy("bucket")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    got = {(r.bucket): r.m_rho for r in merged.collect()}
    assert got == full


def test_quantile_histogram_merges_by_addition(spark):
    ev = tbl(spark, SF, "events")

    def hist(df):
        return (
            df.groupBy(
                F.floor(F.col("value") / 5.0).cast("bigint").alias("bin")
            )
            .agg(F.count("*").alias("c"))
        )

    full = {r.bin: r.c for r in hist(ev).collect()}
    merged = (
        hist(ev.filter(F.col("event_id") % 2 == 0))
        .unionAll(hist(ev.filter(F.col("event_id") % 2 == 1)))
        .groupBy("bin")
        .agg(F.sum("c").alias("c"))
    )
    got = {r.bin: r.c for r in merged.collect()}
    assert got == full
