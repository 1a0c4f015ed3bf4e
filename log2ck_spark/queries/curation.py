"""Corpus curation operators — the incremental / cross-split hygiene
steps of a training-data pipeline: deduplicating a NEW batch against an
existing corpus, and detecting train/eval contamination via n-gram
overlap.

Both reuse the fingerprint and hashed-shingle primitives the dedup
family is built on (functions/text.py): joins move 16-byte digests or
8-byte shingle hashes, never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import md5_bucket
from log2ck_spark.functions.text import hashed_shingles, tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# The fixture's `source` column stands in for batch/split membership:
# src0 plays the eval split (decontamination) or the incoming batch
# (incremental dedup); everything else is the existing corpus.
_NEW = "src0"


@register(
    "dedup_incremental",
    oracle=f"""
    SELECT n.doc_id
    FROM documents n
    WHERE n.source = '{_NEW}'
      AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.source <> '{_NEW}' AND md5(c.text) = md5(n.text)
      )
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: keep only the docs of an incoming
    batch whose content is NOT already in the corpus — the daily-
    ingest shape, where re-deduplicating the whole corpus per batch
    (as `dedup_exact` would) is O(corpus) instead of O(batch).

    Anti join on md5(text): the shuffle carries 16-byte digests, not
    documents; at scale the corpus side is a pre-materialized
    fingerprint table (written once by the previous run), so each
    increment costs one batch scan + one digest join."""
    d = tbl(spark, sf_dir, "documents")
    new = d.filter(F.col("source") == _NEW).select(
        "doc_id", F.md5("text").alias("fp")
    )
    corpus = d.filter(F.col("source") != _NEW).select(F.md5("text").alias("cfp"))
    return new.join(
        corpus, new.fp == corpus.cfp, "left_anti"
    ).select("doc_id")


@register(
    "decontaminate_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, source,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, greatest(len(toks) - 4, 0) + 1)])
               AS s
      FROM tok
    ), eval_grams AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = '{_NEW}'
    ), train_grams AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> '{_NEW}'
    )
    SELECT t.doc_id, COUNT(*) AS n_shared
    FROM train_grams t JOIN eval_grams e ON t.g = e.g
    GROUP BY t.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: training docs sharing >= 2
    distinct word 5-grams with ANY eval-split document, with the
    shared-gram count as evidence — the decontamination step run
    before training on scraped corpora.

    Posting-list join on 64-bit hashed shingles (w.h.p. identical to
    the oracle's string 5-grams): the eval side collapses to its
    DISTINCT gram set first — it is the small side by construction
    (eval sets are orders of magnitude smaller than training corpora)
    and the join key is a uniform hash, so the probe is a skew-free
    hash join against O(eval grams) keys; per-doc shingle sets are
    distinct already, so COUNT(*) after the join IS the distinct
    overlap size — no countDistinct shuffle expansion."""
    sh = (
        tbl(spark, sf_dir, "documents", fanout=True)
        .select("doc_id", "source", tokens("text").alias("toks"))
        .select("doc_id", "source", hashed_shingles("toks", w=5).alias("s"))
    )
    eval_grams = (
        sh.filter(F.col("source") == _NEW)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    train_grams = sh.filter(F.col("source") != _NEW).select(
        "doc_id", F.explode("s").alias("g")
    )
    return (
        train_grams.join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "profile_columns",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE lang IS NULL) AS null_lang,
           COUNT(*) FILTER (WHERE source IS NULL) AS null_source,
           COUNT(DISTINCT lang) AS d_lang,
           COUNT(DISTINCT source) AS d_source,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling summary (the pre-ingest sanity check):
    row count, per-column null counts, low-cardinality distinct
    counts, numeric range. Spark expands the two COUNT(DISTINCT)s via
    one Expand + single shuffle; at true high cardinality swap in
    approx_count_distinct (HLL++) — kept exact here so the oracle can
    check it."""
    d = tbl(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_lang"),
        F.count(F.when(F.col("source").isNull(), 1)).alias("null_source"),
        F.countDistinct("lang").alias("d_lang"),
        F.countDistinct("source").alias("d_source"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "split_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM assigned GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-
    independent key hash — THE property a training split needs: stable
    under reruns, re-partitioning, and corpus growth (a doc never
    migrates between splits when new docs arrive, unlike randomSplit
    or row_number ranges). md5(doc_id)'s first 32 bits mod 100 is
    engine-portable, so the oracle reproduces the exact assignment.
    Narrow map + one partial-agg shuffle; as a filter (split='train')
    it's a codegen'd predicate in the scan."""
    d = tbl(spark, sf_dir, "documents")
    bucket = md5_bucket("doc_id", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "curate_pipeline",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text, n_chars, string_split(text, ' ') AS t FROM documents
    ), kept AS (
      SELECT doc_id, text, n_chars FROM toks
      WHERE len(t) BETWEEN 15 AND 90
        AND 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) <= 0.55
        AND CAST(len(array_to_string(t, '')) AS DOUBLE) / len(t)
            BETWEEN 3.0 AND 8.0
        AND len(list_filter(t, x -> x IN ('a', 'the'))) > 0
    ), dedup AS (
      SELECT MIN(doc_id) AS doc_id, ANY_VALUE(n_chars) AS n_chars
      FROM kept GROUP BY md5(text)
    ), assigned AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM dedup
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM assigned GROUP BY 1
    """,
)
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation flow as ONE composed Spark plan:
    Gopher quality gate (codegen'd scan predicate) → exact dedup
    (md5 groupBy, min-doc_id canonical) → deterministic 80/10/10
    split → per-split accounting. Demonstrates that the operator
    library composes: Catalyst fuses the filter into the scan, the
    dedup is the only wide shuffle (16-byte digests), and the split
    assignment rides the dedup output map-side. This is the shape a
    nightly corpus build runs at 100 TB — filter early (cheapest),
    shuffle digests once, never shuffle text twice."""
    from log2ck_spark.queries.textops3 import (
        _MAX_DUP_TOKEN_FRAC,
        _MAX_MEAN_WORD_LEN,
        _MAX_WORDS,
        _MIN_MEAN_WORD_LEN,
        _MIN_WORDS,
    )

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars", tokens("text").alias("t")
    )
    n = F.size("t")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("t")).cast("double") / n
    mean_wl = F.length(F.array_join("t", "")).cast("double") / n
    n_stop = F.size(F.filter("t", lambda x: x.isin("a", "the")))
    kept = d.filter(
        n.between(_MIN_WORDS, _MAX_WORDS)
        & (dup_frac <= _MAX_DUP_TOKEN_FRAC)
        & mean_wl.between(_MIN_MEAN_WORD_LEN, _MAX_MEAN_WORD_LEN)
        & (n_stop > 0)
    )
    dedup = kept.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"), F.first("n_chars").alias("n_chars")
    )
    bucket = md5_bucket("doc_id", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        dedup.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )
