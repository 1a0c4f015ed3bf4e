"""Corpus curation operators — the incremental / cross-split hygiene
steps of a training-data pipeline: deduplicating a NEW batch against an
existing corpus, and detecting train/eval contamination via n-gram
overlap.

Both reuse the fingerprint and hashed-shingle primitives the dedup
family is built on (functions/text.py): joins move 16-byte digests or
8-byte shingle hashes, never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import md5_bucket, md5_frac
from log2ck_spark.functions.text import (
    hashed_shingles,
    hashed_shingles_positional,
    tokens,
)
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


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights (multilingual sampling design)
# --------------------------------------------------------------------------

_MIX_TEMP = 0.3  # the mBERT/XLM-R exponent: q_l ∝ p_l^0.3


@register(
    "mixture_weights",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents
      WHERE lang IS NOT NULL GROUP BY lang
    ), probs AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p,
             pow(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), {_MIX_TEMP})
               AS q_raw
      FROM counts
    )
    SELECT lang, n_docs,
           ROUND(p, 6) AS p,
           ROUND(q_raw / SUM(q_raw) OVER (), 6) AS q,
           ROUND((q_raw / SUM(q_raw) OVER ()) / p, 6) AS sample_weight
    FROM probs
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixture design: per language, the
    natural share p_l, the temperature-flattened target share
    q_l ∝ p_l^T (T={t}), and the per-doc sampling weight q_l/p_l —
    the standard multilingual rebalancing recipe (low-resource
    languages upsampled, the head language damped). The whole
    computation after the one corpus-count agg runs on |languages|
    rows (two window sums over a tiny frame — broadcast-scale);
    the emitted sample_weight column is exactly what a weighted
    sampler or `sample_stratified`-style rate filter consumes."""
    counts = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )
    wall = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.sum("n_docs").over(wall)
    probs = counts.select(
        "lang", "n_docs", p.alias("p"), F.pow(p, F.lit(_MIX_TEMP)).alias("q_raw")
    )
    q = F.col("q_raw") / F.sum("q_raw").over(wall)
    return probs.select(
        "lang",
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round(q, 6).alias("q"),
        F.round(q / F.col("p"), 6).alias("sample_weight"),
    )


# --------------------------------------------------------------------------
# Contamination spans (merged overlap islands per training doc)
# --------------------------------------------------------------------------


@register(
    "decontaminate_span",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ), grams AS (
      SELECT doc_id, source, u.pos AS pos, u.gram AS gram
      FROM (
        SELECT doc_id, source,
               unnest(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                 i -> {{'pos': i,
                       'gram': array_to_string(toks[i:i+4], ' ')}})) AS u
        FROM tok)
    ), eval_grams AS (
      SELECT DISTINCT gram FROM grams WHERE source = '{_NEW}'
    ), hits AS (
      SELECT t.doc_id, t.pos FROM grams t
      JOIN eval_grams e ON t.gram = e.gram
      WHERE t.source <> '{_NEW}'
    ), islands AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(lag(pos) OVER w, -999) + 5
                  THEN 1 ELSE 0 END AS new_span,
             GREATEST(0, 5 - (pos - COALESCE(lag(pos) OVER w, -999)))
               AS overlap_prev
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    )
    SELECT doc_id,
           CAST(SUM(new_span) AS BIGINT) AS n_spans,
           CAST(SUM(5 - overlap_prev) AS BIGINT) AS n_contaminated_tokens
    FROM islands GROUP BY doc_id
    """,
)
def decontaminate_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination SPANS: where `decontaminate_overlap` counts
    shared grams, this merges each training doc's contaminated 5-gram
    hits into maximal overlapping token islands and reports span count
    + contaminated token count — the evidence needed to decide between
    dropping a doc and surgically cutting the contaminated region (the
    n-gram-overlap decontamination recipe of GPT-3-style dataset
    cards, applied span-wise).

    Plan: position-preserving grams (posexplode — NOT the distinct
    shingle set), hash join against the broadcast-scale distinct eval
    gram set, then per-doc island merging computed entirely inside one
    aggregation — the sorted hit positions fold through a single
    `aggregate` expression (state = (prev_end, spans, covered)), so
    the only shuffles are the gram join and one groupBy(doc_id) of the
    sparse HIT list (not the corpus). The oracle derives the same
    spans independently via a lag/window formulation."""
    g = (
        tbl(spark, sf_dir, "documents", fanout=True)
        .select("doc_id", "source", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "source",
            F.posexplode(hashed_shingles_positional("toks", w=5)).alias(
                "pos0", "gram"
            ),
        )
        .select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    eval_grams = (
        g.filter(F.col("source") == _NEW).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("source") != _NEW)
        .join(eval_grams, "gram")
        .select("doc_id", "pos")
    )
    sorted_pos = F.array_sort(F.collect_list("pos"))
    # fold sorted positions into islands: a hit at pos covers tokens
    # [pos, pos+4]; a hit within prev_end merges, else opens a span.
    state0 = F.struct(
        F.lit(-999).cast("long").alias("prev_end"),
        F.lit(0).cast("long").alias("spans"),
        F.lit(0).cast("long").alias("covered"),
    )
    fold = F.aggregate(
        sorted_pos,
        state0,
        lambda st, p: F.struct(
            (p + 4).cast("long").alias("prev_end"),
            (
                st.spans + F.when(p > st.prev_end + 1, 1).otherwise(0)
            ).alias("spans"),
            # newly covered tokens: [p, p+4] minus what prev_end
            # already covers — p+4 > prev_end always holds for sorted
            # distinct positions, so the delta is unconditional (a
            # partial overlap contributes its d < 5 new tokens).
            (
                st.covered + (p + 4 - F.greatest(p - 1, st.prev_end))
            ).cast("long").alias("covered"),
        ),
    )
    return (
        hits.groupBy("doc_id")
        .agg(fold.alias("st"))
        .select(
            "doc_id",
            F.col("st.spans").alias("n_spans"),
            F.col("st.covered").alias("n_contaminated_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle into training shards
# --------------------------------------------------------------------------

_SHUFFLE_SEED = 42
_N_SHARDS = 32


@register(
    "shuffle_shards",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':{_SHUFFLE_SEED}') AS h
      FROM documents
    )
    SELECT CAST(CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % {_N_SHARDS}
                AS BIGINT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(('0x' || substr(h, 1, 8)) AS BIGINT)
                          % {_N_SHARDS}
             ORDER BY h, doc_id) AS BIGINT) AS pos,
           doc_id
    FROM hashed
    """,
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every epoch
    of LLM training needs the corpus in a pseudo-random order that is
    reproducible (resume mid-epoch, re-run byte-identical) and
    migration-stable — md5(doc_id:seed) gives both, and changing the
    seed re-shuffles. Each doc lands in shard = hash mod N with
    position = hash order within the shard.

    Scale shape: this is the ONLY correct distributed shuffle layout —
    a single global row_number would serialize through one partition,
    while shard-partitioned windows parallelize across N shards (at
    100 TB, N = tens of thousands, each shard a few GB sorted
    locally). Writers then emit one sorted file per shard and readers
    concatenate shards in index order: global order without any
    global sort. One hash-partition exchange, no driver state."""
    d = tbl(spark, sf_dir, "documents")
    key = F.concat_ws(":", F.col("doc_id"), F.lit(_SHUFFLE_SEED))
    hashed = d.select("doc_id", F.md5(key).alias("h"))
    shard = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint") % _N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        hashed.select(shard.alias("shard"), "h", "doc_id")
        .select(
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
        )
    )


_MIX_BASE_RATE = 0.5  # overall target sampling rate before reweighting


@register(
    "sample_by_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents
      WHERE lang IS NOT NULL GROUP BY lang
    ), probs AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p,
             pow(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), {{t}})
               AS q_raw
      FROM counts
    ), weights AS (
      SELECT lang, n_docs,
             ROUND((q_raw / SUM(q_raw) OVER ()) / p, 6) AS w
      FROM probs
    )
    SELECT d.lang, w.n_docs,
           COUNT(*) FILTER (
             WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                            || ':mix'), 1, 8)) AS BIGINT)
                   / 4294967296.0 < least(w.w * {_MIX_BASE_RATE}, 1.0)
           ) AS n_sampled
    FROM documents d JOIN weights w USING (lang)
    GROUP BY 1, 2
    """.format(t=0.3),
)
def sample_by_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture design APPLIED: mixture_weights' temperature-scaled
    per-language sample_weight drives a deterministic md5 sampler —
    doc kept iff hash_frac(doc_id:mix) < min(w·base_rate, 1). Head
    languages are damped, low-resource languages kept (weight > 1
    saturates at keep-everything), and membership is reproducible and
    migration-stable like every sampler in this repo. This is the
    second composed-pipeline query (after curate_pipeline): two
    registered operators' logic fused into ONE plan — the weights
    subtree aggregates to |languages| rows, broadcasts back onto the
    corpus scan, and the keep-test is a codegen'd per-row predicate.
    At 100 TB: one corpus-count agg + one corpus scan, nothing else."""
    d = tbl(spark, sf_dir, "documents")
    counts = (
        d.filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )
    wall = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.sum("n_docs").over(wall)
    probs = counts.select(
        "lang", "n_docs", p.alias("p"), F.pow(p, F.lit(0.3)).alias("q_raw")
    )
    w = F.round(
        (F.col("q_raw") / F.sum("q_raw").over(wall)) / F.col("p"), 6
    )
    weights = probs.select("lang", "n_docs", w.alias("w"))
    keep = md5_frac(F.concat(F.col("doc_id"), F.lit(":mix"))) < F.least(
        F.col("w") * _MIX_BASE_RATE, F.lit(1.0)
    )
    return (
        d.join(F.broadcast(weights), "lang")
        .groupBy("lang", "n_docs")
        .agg(F.count(F.when(keep, 1)).alias("n_sampled"))
    )


@register(
    "corpus_report",
    oracle="""
    WITH scored AS (
      SELECT source, lang, n_chars, md5(text) AS digest,
             len(string_split(text, ' ')) AS n_tokens,
             (len(string_split(text, ' ')) BETWEEN 15 AND 90
              AND 1.0 - CAST(len(list_distinct(string_split(text, ' ')))
                             AS DOUBLE) / len(string_split(text, ' '))
                  <= 0.55
              AND CAST(len(array_to_string(string_split(text, ' '), ''))
                       AS DOUBLE) / len(string_split(text, ' '))
                  BETWEEN 3.0 AND 8.0
              AND len(list_filter(string_split(text, ' '),
                                  x -> x IN ('a', 'the'))) > 0) AS ok
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6)
             AS mean_tokens,
           ROUND(CAST(COUNT(*) FILTER (WHERE ok) AS DOUBLE) / COUNT(*), 6)
             AS gopher_pass_rate,
           ROUND(1.0 - CAST(COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM scored GROUP BY source
    """,
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus report card: one row per source with the numbers a
    curation run is judged by — volume (docs, chars, mean tokens),
    quality (Gopher-gate pass rate, textops3's exact rule set),
    redundancy (exact-dup rate via content digests), and language
    diversity. This is the artifact every ingest batch publishes
    before it is admitted to a training mixture, and the input to
    mixture_weights' source weighting.

    ONE corpus scan computes every signal (the Gopher predicate,
    token stats and digest are all scan expressions); the per-source
    aggregation carries two distinct-aggregates (digest, lang), which
    Spark executes with expand — still a single pass over the scan
    output, grouped on the low-cardinality source key."""
    from log2ck_spark.queries.textops3 import (
        _MAX_DUP_TOKEN_FRAC,
        _MAX_MEAN_WORD_LEN,
        _MAX_WORDS,
        _MIN_MEAN_WORD_LEN,
        _MIN_WORDS,
    )

    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", "lang", "n_chars", F.md5("text").alias("digest"),
                tokens("text").alias("t"))
    )
    n = F.size("t")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("t")).cast("double") / n
    mean_wl = F.length(F.array_join("t", "")).cast("double") / n
    n_stop = F.size(F.filter("t", lambda x: x.isin("a", "the")))
    ok = (
        n.between(_MIN_WORDS, _MAX_WORDS)
        & (dup_frac <= _MAX_DUP_TOKEN_FRAC)
        & mean_wl.between(_MIN_MEAN_WORD_LEN, _MAX_MEAN_WORD_LEN)
        & (n_stop > 0)
    )
    scored = d.select(
        "source", "lang", "n_chars", "digest", n.alias("n_tokens"),
        ok.alias("ok"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.round(
            F.sum("n_tokens").cast("double") / F.count("*"), 6
        ).alias("mean_tokens"),
        F.round(
            F.count(F.when(F.col("ok"), 1)).cast("double") / F.count("*"), 6
        ).alias("gopher_pass_rate"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("digest").cast("double") / F.count("*"),
            6,
        ).alias("dup_rate"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


@register(
    "contrastive_pairs",
    oracle="""
    WITH hashed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':neg') AS h,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':neg'),
                                  1, 8)) AS BIGINT) % 32 AS bucket
      FROM documents
    )
    SELECT anchor_doc, negative_doc FROM (
      SELECT doc_id AS anchor_doc,
             lead(doc_id) OVER (PARTITION BY bucket ORDER BY h, doc_id)
               AS negative_doc
      FROM hashed)
    WHERE negative_doc IS NOT NULL
    """,
)
def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    doc is paired with a pseudo-random OTHER doc — its successor in a
    seeded md5 ring — giving uniform negatives that are reproducible
    across reruns and stable as the corpus grows (a doc's negative
    changes only if its hash-neighbor changes). randomSplit/rand()
    negatives are neither. Seed in the hash key re-deals all pairs.

    Scale shape: the ring is bucketed (md5-prefix mod 32) so the
    neighbor window parallelizes per bucket — no global sort; the
    per-bucket boundary doc simply emits no pair (uniformly ~1/bucket
    of docs, harmless for negative sampling). Same skeleton as
    shuffle_shards; at 100 TB raise the bucket count with the
    corpus."""
    d = tbl(spark, sf_dir, "documents")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":neg"))
    hashed = d.select(
        "doc_id",
        F.md5(key).alias("h"),
        md5_bucket(key, 32).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        hashed.select(
            F.col("doc_id").alias("anchor_doc"),
            F.lead("doc_id").over(w).alias("negative_doc"),
        )
        .filter(F.col("negative_doc").isNotNull())
    )
