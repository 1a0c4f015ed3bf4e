"""BUCKET_CAP — the bounded per-bucket pair expansion (r10).

A duplicate class of d docs shares every LSH band / simhash chunk, so
one bucket collects all d ids; the old i<j expansion materialized
d(d-1)/2 structs in a single task (a 1M-copy boilerplate page — normal
in a web crawl — is a 5×10¹¹-pair array, i.e. an executor OOM). The
capped expansion bounds it to cap(cap-1)/2 + (d-cap) while keeping
every doc connected to the bucket min (no silent drops): exact-dup
classes still dedup completely, transitively, through the shared min.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.queries.dedup import (
    BUCKET_CAP,
    _candidate_pairs,
    capped_pairs_expr,
    pairs_expr,
)


def _pairs(spark, ids, cap):
    df = spark.createDataFrame([(ids,)], "ids array<bigint>")
    return [
        (r["p"]["doc_a"], r["p"]["doc_b"])
        for r in df.select(
            F.explode(capped_pairs_expr("ids", cap=cap)).alias("p")
        ).collect()
    ]


def test_at_or_under_cap_is_exactly_full_expansion(spark):
    """Buckets within the cap produce the identical i<j pair set —
    fixture-scale oracle output is unchanged by the cap."""
    ids = list(range(1, 9))
    got = sorted(_pairs(spark, ids, cap=8))
    df = spark.createDataFrame([(ids,)], "ids array<bigint>")
    full = sorted(
        (r["p"]["doc_a"], r["p"]["doc_b"])
        for r in df.select(F.explode(pairs_expr("ids")).alias("p")).collect()
    )
    assert got == full == [
        (a, b) for a in ids for b in ids if a < b
    ]


def test_bomb_bucket_is_bounded_and_fully_connected(spark):
    """A 500-id dup-class bucket at cap=32: expansion is
    32·31/2 + 468 = 964 pairs (not 124 750), every id appears in at
    least one pair, and every tail id is star-paired with the min."""
    cap, d = 32, 500
    ids = list(range(1, d + 1))
    got = _pairs(spark, ids, cap=cap)
    assert len(got) == cap * (cap - 1) // 2 + (d - cap)
    seen = {x for p in got for x in p}
    assert seen == set(ids)
    tail_pairs = [p for p in got if p[1] > cap]
    assert all(a == 1 for a, _ in tail_pairs)
    assert len(got) < d * (d - 1) // 2 // 10


def test_candidate_pairs_bomb_completes_bounded(spark):
    """End-to-end through _candidate_pairs: a 5000-doc duplicate class
    in one (band, bucket) key completes with O(cap² + d) output pairs
    and full membership — the 10k-copy-class scenario scaled to test
    time. With the default BUCKET_CAP=1024 the old expansion would be
    12.5M pairs; the capped one is ≤ 527k."""
    d = 5000
    posting = spark.range(1, d + 1).select(
        F.lit(0).alias("band"),
        F.lit(7).alias("bucket"),
        F.col("id").alias("doc_id"),
    )
    out = _candidate_pairs(posting, ["band", "bucket"])
    n = out.count()
    assert n == BUCKET_CAP * (BUCKET_CAP - 1) // 2 + (d - BUCKET_CAP)
    n_docs = out.select(
        F.explode(F.array("doc_a", "doc_b")).alias("x")
    ).distinct().count()
    assert n_docs == d


def test_shingle_cap_noop_under_cap_and_bounds_over_cap(spark):
    """SHINGLE_CAP (r10, the --jumbo follow-through): docs at or under
    2^18 distinct shingles keep their EXACT shingle set (fixture-scale
    oracle rows unchanged — the --jumbo outlier is ~20k, 7% of the
    cap), while a pathological outlier's set is cut to a
    deterministic first-occurrence prefix, bounding both the MinHash
    hash count and the shuffle row for the one task holding it."""
    from pyspark.sql import functions as F

    from log2ck_spark.functions.text import hashed_shingles, tokens
    from log2ck_spark.queries.dedup import SHINGLE_CAP

    # under-cap doc: capped spelling == uncapped spelling exactly
    words = " ".join(f"w{i}" for i in range(5000))
    df = spark.createDataFrame([(words,)], "text string").select(
        tokens("text").alias("toks")
    )
    uncapped = df.select(hashed_shingles("toks", w=5).alias("sh"))
    capped = df.select(
        F.slice(hashed_shingles("toks", w=5), 1, SHINGLE_CAP).alias("sh")
    )
    assert uncapped.collect()[0]["sh"] == capped.collect()[0]["sh"]

    # over-cap synthetic: a 300k-element array slices to exactly the
    # cap, preserving the prefix (deterministic, no sampling)
    big = spark.range(1).select(
        F.sequence(F.lit(1), F.lit(300_000)).alias("sh")
    )
    out = big.select(F.slice("sh", 1, SHINGLE_CAP).alias("sh")).collect()[0][
        "sh"
    ]
    assert len(out) == SHINGLE_CAP
    assert out[:5] == [1, 2, 3, 4, 5]


def test_fixture_corpora_stay_under_shingle_cap():
    """Oracle-divergence canary (ADVICE r10): SHINGLE_CAP is applied
    Spark-side only — the DuckDB oracle (_ORACLE_SHINGLE_PAIRS)
    computes UNCAPPED shingle sets, so the parity gate is meaningful
    only while every fixture document stays under the cap. If a
    future fixture/testdata refresh ships a >2^18-distinct-shingle
    document, this fails LOUDLY here instead of the two engines
    silently diverging. Checks the largest docs across the standard
    parity SFs and the --jumbo hostile fixture (the outlier-document
    gate, the likeliest place a monster doc would appear)."""
    import duckdb

    from tests.oracle_harness import build_jumbo_fixture
    from log2ck_spark.queries.dedup import SHINGLE_CAP

    dirs = [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        build_jumbo_fixture(),
    ]
    con = duckdb.connect()
    for d in dirs:
        (worst,) = con.execute(
            f"""
            SELECT max(len(list_distinct(
                [array_to_string(toks[i:i+4], ' ')
                 for i in range(1, greatest(len(toks) - 4, 0) + 1)])))
            FROM (SELECT string_split(text, ' ') AS toks
                  FROM read_parquet('{d}/documents.parquet'))
            """
        ).fetchone()
        assert worst is not None and worst < SHINGLE_CAP, (d, worst)
        # headroom report: fail while there is still slack to react
        assert worst < SHINGLE_CAP // 2, (
            f"{d}: largest doc at {worst} distinct shingles is past "
            f"half of SHINGLE_CAP={SHINGLE_CAP} — revisit the cap or "
            f"mirror it in the oracle before the gap closes"
        )
