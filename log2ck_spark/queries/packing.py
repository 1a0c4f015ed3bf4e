"""Training-batch assembly operators over `documents` — the step
between a curated corpus and a training run: fixed-window chunking,
sequence packing into context-length bins, stratified (per-language)
downsampling, and a linear quality classifier.

All four are oracle-checked: chunking/packing are deterministic
column/window expressions, sampling and classification key on the
engine-portable md5 bucket pattern (see pipelineops.sample_hash_
bernoulli). Reference scope note: the reference engine's query
surface ends at ClickHouse SQL (readme.md:106-125); these operators
are part of the declared LLM-pipeline extension set (SURVEY.md §2
Part C), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import (
    md5_bucket,
    md5_frac,
    oracle_md5_bucket,
    oracle_md5_frac,
)
from log2ck_spark.functions.text import bound, tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# Fixed-window chunking with overlap (the RAG / long-doc training chunker)
# --------------------------------------------------------------------------

_CHUNK_W = 16  # tokens per chunk
_CHUNK_STRIDE = 12  # overlap = _CHUNK_W - _CHUNK_STRIDE


@register(
    "chunk_documents",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(u.chunk_id AS INTEGER) AS chunk_id,
           CAST(u.n_tok AS INTEGER) AS n_tok,
           u.chunk_text
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(range(1, len(t) + 1, {_CHUNK_STRIDE}),
                 s -> s = 1 OR s <= len(t) - {_CHUNK_W - _CHUNK_STRIDE}),
               s -> {{'chunk_id': (s - 1) // {_CHUNK_STRIDE},
                     'chunk_text':
                       array_to_string(t[s:s + {_CHUNK_W - 1}], ' '),
                     'n_tok': len(t[s:s + {_CHUNK_W - 1}])}})) AS u
      FROM d)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size token windows
    (w={_CHUNK_W}, stride={_CHUNK_STRIDE}, so consecutive chunks
    overlap by w-stride tokens) — the chunker in front of embedding /
    context-window training jobs. One codegen'd
    sequence+transform+explode per row: purely map-side, no shuffle,
    scales linearly with corpus bytes; output rows ≈ docs x
    ceil(len/stride). The token array is let-bound (`bound`) so the
    per-window slice reads a materialized array instead of re-running
    the split per chunk (see functions.text.bound).

    A trailing start past n - overlap would yield a chunk FULLY
    contained in its predecessor (no new tokens — pure duplication in
    the training set); such starts are filtered, which also makes the
    chunk set losslessly reconstructable (tests/test_packing.py)."""
    d = tbl(spark, sf_dir, "documents", fanout=True).select(
        "doc_id", tokens("text").alias("t")
    )

    def _chunks(t):
        starts = F.filter(
            F.sequence(F.lit(1), F.size(t), F.lit(_CHUNK_STRIDE)),
            lambda s: (s == 1)
            | (s <= F.size(t) - F.lit(_CHUNK_W - _CHUNK_STRIDE)),
        )
        return F.transform(
            starts,
            lambda s: F.struct(
                F.array_join(F.slice(t, s, _CHUNK_W), " ").alias("chunk_text"),
                F.size(F.slice(t, s, _CHUNK_W)).alias("n_tok"),
            ),
        )

    return (
        d.select("doc_id", bound(F.col("t"), _chunks).alias("chunks"))
        .select("doc_id", F.posexplode("chunks").alias("chunk_id", "c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int"),
            F.col("c.n_tok").cast("int").alias("n_tok"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing (concat-and-cut into fixed token budgets)
# --------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per training sequence
_PACK_GROUPS = 8  # parallel packing streams


@register(
    "pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             {oracle_md5_bucket("doc_id", _PACK_GROUPS)} AS pack_group,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT doc_id, pack_group, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY pack_group ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM d
    )
    SELECT doc_id,
           CAST(pack_group AS INTEGER) AS pack_group,
           CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS bin_offset,
           CAST(n_tok AS INTEGER) AS n_tok,
           CAST((cum_before + n_tok - 1) // {_PACK_BUDGET}
                > cum_before // {_PACK_BUDGET} AS INTEGER) AS straddles
    FROM packed
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing: documents are concatenated in
    deterministic (doc_id) order within {_PACK_GROUPS} hash-assigned
    packing streams, and each stream's token tape is cut into
    {_PACK_BUDGET}-token training sequences. Emits every doc's
    (stream, bin, offset) placement plus whether it straddles a bin
    boundary — the GPT-style pack-then-split recipe, where a straddled
    doc is split across two sequences rather than padded.

    Scale shape: packing is inherently sequential, so a single global
    order would serialize the corpus through one task. Hash-splitting
    into independent streams is the standard fix — each stream packs
    locally (window sort within its partition), streams scale with the
    corpus (at 100 TB you run ~#cores streams, here {_PACK_GROUPS} for
    the fixture), and the md5 stream assignment is engine-portable and
    rerun-stable. The only wide op is the per-stream window sort; no
    driver-side state."""
    d = tbl(spark, sf_dir, "documents", fanout=True).select(
        "doc_id",
        md5_bucket("doc_id", _PACK_GROUPS).alias("pack_group"),
        F.size(tokens("text")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    bin_id = F.floor(F.col("cum_before") / _PACK_BUDGET)
    return packed.select(
        "doc_id",
        F.col("pack_group").cast("int"),
        bin_id.cast("bigint").alias("bin_id"),
        (F.col("cum_before") % _PACK_BUDGET).cast("bigint").alias("bin_offset"),
        F.col("n_tok").cast("int"),
        (
            F.floor((F.col("cum_before") + F.col("n_tok") - 1) / _PACK_BUDGET)
            > bin_id
        )
        .cast("int")
        .alias("straddles"),
    )


# --------------------------------------------------------------------------
# Stratified (per-language) deterministic downsampling
# --------------------------------------------------------------------------

_STRATA_CAP = 100  # target docs per language


@register(
    "sample_stratified",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ), sampled AS (
      SELECT d.doc_id, d.lang, c.n_total
      FROM documents d JOIN counts c USING (lang)
      WHERE {oracle_md5_frac("d.doc_id")}
            < LEAST(1.0, {_STRATA_CAP}.0 / c.n_total)
    )
    SELECT lang,
           CAST(ANY_VALUE(n_total) AS BIGINT) AS n_total,
           COUNT(*) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           ROUND(LEAST(1.0, {_STRATA_CAP}.0 / ANY_VALUE(n_total)), 6) AS rate
    FROM sampled GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced downsampling: cap every language at
    ~{_STRATA_CAP} docs by keeping each doc iff its md5 hash-fraction
    falls below the language's target rate — the data-mixture
    rebalancing step of multilingual corpus builds. Rate-based (not
    rank-based): `textops2.stratified_sample` is the complementary
    hard-quota shape (exactly k per stratum via a per-stratum window);
    this one targets a rate so the dominant language never funnels
    through one window task at corpus scale (classic skew) — the hash
    threshold is a narrow per-row predicate once the tiny per-language
    counts (|languages| rows) broadcast back, so
    the plan is one small agg + one broadcast-joined scan at any
    corpus size — and membership is rerun/partitioning-stable.
    Emits per-language totals + a doc_id checksum of the sampled
    membership so the oracle verifies the exact sample, not just its
    size."""
    d = tbl(spark, sf_dir, "documents", fanout=True)
    counts = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    frac = md5_frac("doc_id")
    rate = F.least(F.lit(1.0), F.lit(float(_STRATA_CAP)) / F.col("n_total"))
    return (
        d.join(F.broadcast(counts), "lang")
        .filter(frac < rate)
        .groupBy("lang")
        .agg(
            F.first("n_total").cast("bigint").alias("n_total"),
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
            F.round(
                F.least(
                    F.lit(1.0), F.lit(float(_STRATA_CAP)) / F.first("n_total")
                ),
                6,
            ).alias("rate"),
        )
    )


# --------------------------------------------------------------------------
# Linear quality classifier (fasttext-style scorer, fixed weights)
# --------------------------------------------------------------------------

# score = sigmoid(b + w·x) over cheap, engine-portable text features.
# Fixed public weights (hand-set to spread the fixture over buckets);
# a trained model would ship its coefficients the same way — the
# OPERATOR is the deployment shape: score every doc in the scan, no
# model server in the loop.
_QC_BIAS = 1.2
_QC_W_DUP = -6.0  # duplicate-token fraction hurts
_QC_W_STOP = 4.0  # stopword presence helps (prose-likeness)
_QC_W_LEN = 0.015  # mild length preference
_QC_LEN_REF = 40  # tokens


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, t,
             1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_frac,
             CAST(len(list_filter(t, x -> x IN ('a', 'the'))) AS DOUBLE)
               / len(t) AS stop_frac,
             len(t) AS n_tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ), scored AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + exp(-({_QC_BIAS}
                    + {_QC_W_DUP} * dup_frac
                    + {_QC_W_STOP} * stop_frac
                    + {_QC_W_LEN} * (n_tok - {_QC_LEN_REF})))), 6) AS score
      FROM feats
    )
    -- FLOOR, not CAST: DuckDB's double->int cast rounds-to-nearest
    -- while Spark's truncates toward zero.
    SELECT CAST(LEAST(FLOOR(score * 10), 9) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(MIN(score), 6) AS min_score,
           ROUND(MAX(score), 6) AS max_score
    FROM scored GROUP BY 1
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring as a column expression: a logistic
    scorer over cheap text features (duplicate-token fraction,
    stopword rate, length), bucketed into score deciles — the
    classifier-filter stage of a curation pipeline (CCNet/fasttext
    shape) with the coefficients shipped INTO the scan instead of
    calling out to a model service. Pure codegen'd math per row + one
    tiny partial-agg: scores 10^10 docs in the read stage. The decile
    histogram (with min/max per bucket) is the monitoring artifact a
    filter threshold gets tuned on; filtering itself is `score >= t`
    pushed into the same scan. Scores round to 6 decimals before
    bucketing so Spark/DuckDB libm ULP differences can't flip a
    bucket."""
    d = tbl(spark, sf_dir, "documents", fanout=True).select(
        "doc_id", tokens("text").alias("t")
    )
    n = F.size("t")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("t")).cast("double") / n
    stop_frac = (
        F.size(F.filter("t", lambda x: x.isin("a", "the"))).cast("double") / n
    )
    z = (
        F.lit(_QC_BIAS)
        + F.lit(_QC_W_DUP) * dup_frac
        + F.lit(_QC_W_STOP) * stop_frac
        + F.lit(_QC_W_LEN) * (n - F.lit(_QC_LEN_REF))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        d.select(score.alias("score"))
        .select(
            F.least((F.col("score") * 10).cast("int"), F.lit(9)).alias("bucket"),
            "score",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
    )
