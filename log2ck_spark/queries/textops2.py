"""Corpus-statistics operators over `documents` — the relevance /
quality layer of a training-data pipeline: TF-IDF, BM25 retrieval
scoring, bigram frequencies, token-distribution entropy, stratified
sampling, heavy hitters, and length histograms.

Everything is pure DataFrame expressions (JVM-side). Floating-point
parity notes: transcendental results (ln/log2) are rounded or
decimal-guarded before any aggregation or ranking, so the oracle
comparison never rides on cross-engine ULP differences in summation
order; scalar fan-in values (corpus size, avg doc length) are exact
integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import DECIMAL
from log2ck_spark.functions.plan import array_compute_once
from log2ck_spark.functions.text import tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT doc_id, term,
             ROUND(tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df),
                   6) AS score
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, score
    FROM (SELECT *, row_number()
                    OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Three aggregation passes that
    all share the (doc_id, term) exchange: tf, then the |vocab|-row df
    table (left to AQE — broadcast while it fits, zipfian vocab never
    skews a 64-bit term hash), then a per-doc window rank. Ranking
    happens on the ROUNDED score (+ term tie-break), so the top-3 set
    is identical cross-engine even if ln() differs in the last ulp."""
    d = tbl(spark, sf_dir, "documents")
    n_docs = d.count()  # O(1) metadata-ish scalar; folded as a literal
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )


# --------------------------------------------------------------------------
# BM25 retrieval scoring for a term query
# --------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash")


@register(
    "bm25_score",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
      FROM base
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM base)
      WHERE term IN ('join', 'hash')
      GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM base
    ), parts AS (
      SELECT tf.doc_id,
             ROUND(ln(1 + (n - df + 0.5) / (df + 0.5))
                   * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))),
                   6) AS part
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
    )
    SELECT doc_id,
           CAST(CAST(SUM(TRY_CAST(CAST(part AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS score
    FROM parts GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-20 documents for a 2-term query. The
    posting lists (tf rows for the query terms only) are built by one
    filtered explode — the scan discards non-query terms before any
    shuffle, so cost scales with the query's posting size, not corpus
    vocabulary. df and the (N, avgdl) scalars broadcast. Per-term
    partials are rounded then decimal-summed, so the doc score is
    order-independent."""
    d = tbl(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens("text").alias("toks"))
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum(F.size("toks")).cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = base.select("doc_id", F.size("toks").cast("double").alias("dl"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl")))
    )
    parts = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", F.round(idf * tf_part, 6).alias("part"))
    )
    return (
        parts.groupBy("doc_id")
        .agg(F.sum(F.col("part").try_cast(DECIMAL)).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Bigram frequency (shuffle-free pair construction)
# --------------------------------------------------------------------------


@register(
    "bigram_stats",
    oracle="""
    WITH base AS (
      SELECT string_split(text, ' ') AS toks FROM documents
    ), big AS (
      SELECT list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM base
    )
    SELECT bigram, COUNT(*) AS n
    FROM (SELECT unnest(bigrams) AS bigram FROM big)
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams. Adjacent pairs are built INSIDE the token
    array (`zip_with` against the array shifted by one — the trailing
    unpaired slot concats with null and drops), so pairing needs no
    per-document window and therefore no shuffle at all before the
    count aggregation: one scan stage, then the two-phase agg — 100 TB
    of pairing stays embarrassingly parallel (a per-document lead()
    window would add a full shuffle for nothing)."""
    d = tbl(spark, sf_dir, "documents").select(tokens("text").alias("toks"))
    shifted = F.slice(
        F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))
    )
    pairs = F.zip_with(
        F.col("toks"), shifted, lambda a, b: F.concat(a, F.lit(" "), b)
    )
    return (
        d.select(F.explode(pairs).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Token-distribution entropy per document
# --------------------------------------------------------------------------


@register(
    "doc_entropy",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(tf) AS INTEGER) AS n_tokens,
           ROUND(log2(CAST(SUM(tf) AS DOUBLE))
                 - CAST(CAST(SUM(TRY_CAST(CAST(tf * log2(tf) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / SUM(tf),
                 6) AS entropy
    FROM tf GROUP BY doc_id
    """,
)
def doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's unigram distribution — a
    repetitiveness signal (near-0 = one token repeated; high = diverse).
    Uses the identity H = log2(n) − Σ tf·log2(tf) / n so a single
    (doc_id, term) aggregation feeds a single per-doc aggregation —
    no per-term probability join. The Σ tf·log2(tf) partials are
    decimal-guarded: double summation order differs across engines and
    partitionings, decimal addition doesn't."""
    tf = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n = F.sum("tf")
    s = F.sum((F.col("tf") * F.log2("tf")).try_cast(DECIMAL)).cast("double")
    return tf.groupBy("doc_id").agg(
        n.cast("int").alias("n_tokens"),
        F.round(F.log2(n.cast("double")) - s / n, 6).alias("entropy"),
    )


# --------------------------------------------------------------------------
# Deterministic stratified sample (k per stratum)
# --------------------------------------------------------------------------


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language sample, ordered by a content-keyed md5 —
    a uniform, deterministic, engine-portable draw (same contract as
    `sample_hash_bernoulli`, but with a hard per-stratum quota, the
    shape used for balanced eval-set carving). One shuffle on the
    stratum key; within each stratum the window keeps a 20-row
    running top — at scale, strata are processed independently so a
    giant language doesn't serialize the job."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# Heavy hitters (terms above a corpus-frequency threshold)
# --------------------------------------------------------------------------


@register(
    "heavy_hitters",
    oracle="""
    WITH tf AS (
      SELECT term, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    )
    SELECT term, n FROM tf
    WHERE n > 0.005 * (SELECT SUM(n) FROM tf)
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms exceeding 0.5% of all token occurrences — the exact
    variant of frequent-item detection (candidate stopword / boilerplate
    lists). Two-phase hash agg collapses to |vocab| rows; the global
    total re-aggregates those |vocab| rows (no second corpus scan) and
    broadcasts as a 1-row scalar. The approximate path at extreme
    cardinality is `approx_distinct`-style sketching; exact is kept
    here so the oracle can check it."""
    tf = (
        tbl(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    total = tf.agg((F.sum("n") * F.lit(0.005)).alias("threshold"))
    return (
        tf.join(F.broadcast(total))
        .filter(F.col("n") > F.col("threshold"))
        .select("term", "n")
    )


# --------------------------------------------------------------------------
# Document-length histogram
# --------------------------------------------------------------------------


@register(
    "length_histogram",
    oracle="""
    SELECT CAST(FLOOR(n_chars / 50.0) AS INTEGER) * 50 AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS INTEGER) AS min_chars,
           CAST(MAX(n_chars) AS INTEGER) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (50-char) document length histogram — the standard
    first look at a corpus before length filtering. Single scan,
    two-phase agg on the bucket key; at 100 TB the histogram is
    O(#buckets) rows regardless of corpus size."""
    bucket = (F.floor(F.col("n_chars") / F.lit(50.0)).cast("int") * 50).alias(
        "bucket_lo"
    )
    return (
        tbl(spark, sf_dir, "documents")
        .groupBy(bucket)
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("int").alias("min_chars"),
            F.max("n_chars").cast("int").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
# Unigram-LM perplexity (the CCNet-style statistical quality signal)
# --------------------------------------------------------------------------


@register(
    "doc_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), freq AS (
      SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
    ), total AS (
      SELECT SUM(tf) AS n FROM freq
    ), scored AS (
      SELECT t.doc_id,
             ROUND(log2(CAST(f.tf AS DOUBLE) / total.n), 9) AS lp
      FROM toks t JOIN freq f USING (term), total
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(-CAST(CAST(SUM(TRY_CAST(CAST(lp AS VARCHAR) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / COUNT(*),
                 6) AS bits_per_token
    FROM scored GROUP BY doc_id
    """,
)
def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bits-per-token under the corpus's own unigram LM —
    the cheap perplexity-style quality filter (CCNet buckets its
    corpus by LM perplexity; a unigram model is the degenerate-but-
    computable member of that family, needing no external artifact).
    Low bits = dominated by corpus-frequent tokens; high bits = rare/
    noisy vocabulary. Filtering is a predicate on the output.

    Plan: one (term, tf) vocabulary agg; the corpus total folds in as
    a 1-row cross join (broadcast scalar); the token-stream join back
    to the vocabulary is the same exchange shape as TF-IDF. Per-term
    log2 is rounded to 9 decimals BEFORE the decimal-guarded sum —
    cross-engine ULP differences in libm log2 die at 1e-9, the decimal
    sum kills order dependence, and the final /n rounds to 6."""
    toks = tbl(spark, sf_dir, "documents", fanout=True).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("n"))
    lp = F.round(F.log2(F.col("tf").cast("double") / F.col("n")), 9)
    scored = (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            -F.sum(F.col("lp").try_cast("decimal(18,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("bits_per_token"),
    )


@register(
    "pmi_collocations",
    oracle="""
    WITH base AS (
      SELECT string_split(text, ' ') AS toks FROM documents
    ), uni AS (
      SELECT tok, COUNT(*) AS n FROM (
        SELECT unnest(toks) AS tok FROM base) GROUP BY tok
    ), n_uni AS (
      SELECT SUM(n) AS total FROM uni
    ), big AS (
      SELECT w1, w2, COUNT(*) AS n FROM (
        SELECT u.p.w1 AS w1, u.p.w2 AS w2 FROM (
          SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS p
          FROM base) u)
      GROUP BY 1, 2
    ), n_big AS (
      SELECT SUM(n) AS total FROM big
    )
    SELECT b.w1, b.w2, b.n,
           ROUND(log2((CAST(b.n AS DOUBLE) / n_big.total)
                      / ((CAST(u1.n AS DOUBLE) / n_uni.total)
                         * (CAST(u2.n AS DOUBLE) / n_uni.total))), 6) AS pmi
    FROM big b
    JOIN uni u1 ON u1.tok = b.w1
    JOIN uni u2 ON u2.tok = b.w2, n_big, n_uni
    WHERE b.n >= 5
    ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church &
    Hanks 1990): bigrams whose observed rate beats the independence
    prediction of their unigram rates — the standard corpus-analysis
    signal for multiword expressions (and, in training-data work, for
    spotting templated/boilerplate couplings). Min count 5 applies
    the usual sparse-PMI cut.

    Shape: the shuffle-free zip_with pairing from bigram_stats feeds
    one bigram agg; two broadcast joins attach the (vocab-sized)
    unigram counts; totals ride along as broadcast single-row aggs.
    Each PMI is one float expression on exact integer counts —
    identical IEEE math in both engines, no accumulation order to
    diverge. Top-20 by (pmi, w1, w2) — rounded-6 pmi could tie across
    engines only if two ratios agree to 1e-6, resolved by the word
    tiebreak."""
    d = tbl(spark, sf_dir, "documents").select(tokens("text").alias("toks"))
    uni = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    shifted = F.slice(
        F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))
    )
    pairs = F.zip_with(
        F.col("toks"),
        shifted,
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # array_compute_once (r13): the inferred generator filter re-ran
    # the zip_with bigram construction twice more per row.
    big = (
        d.select(F.explode(array_compute_once(pairs)).alias("p"))
        .filter(F.col("p.w2").isNotNull())
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )
    n_uni = uni.agg(F.sum("n").alias("t_uni"))
    # r13 (guide §2.3): a doc emits size(toks)-1 bigrams (the zip_with
    # pad is the single NULL w2 the old count branch filtered; split()
    # never yields NULL elements, and a NULL text contributes 0 both
    # ways because greatest() skips the NULL size). Summing sizes
    # keeps the total a concurrent partial-agg scan — the explode of
    # every bigram into rows existed only to be counted. (Deriving
    # t_big from the MAIN bigram aggregate instead measured ~1.2x
    # SLOWER: it serializes the 1-row total behind the full bigram
    # exchange that the independent count branch used to overlap.)
    n_big_all = d.agg(
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("t_big")
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    pmi = F.log2(
        (F.col("n").cast("double") / F.col("t_big"))
        / (
            (F.col("n1").cast("double") / F.col("t_uni"))
            * (F.col("n2").cast("double") / F.col("t_uni"))
        )
    )
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_big_all))
        .crossJoin(F.broadcast(n_uni))
        .select("w1", "w2", "n", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )
