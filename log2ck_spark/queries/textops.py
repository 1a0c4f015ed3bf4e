"""Text analysis operators (SURVEY.md §2 C4) over `documents`.

Language-ID, quality scoring, token counting (whitespace + BPE-ish
regex), fingerprint clustering. All pure column expressions; every
query here is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.text import fingerprint, tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# Tiny function-word table per language — the classic n-gram/stopword
# language-ID heuristic scaled down to the fixture's vocabulary. The
# same CASE logic is mirrored in the oracle so the heuristic itself is
# cross-checked.
_STOPWORDS = ("a", "the")


@register(
    "text_token_count",
    oracle="""
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n FROM t GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-20: explode + two-phase hash agg +
    TakeOrdered. The map-side partial agg collapses each partition to
    |vocab| rows before the shuffle."""
    return (
        tbl(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_quality_score",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the')))
               AS n_stop,
             n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(n_distinct AS INTEGER) AS n_distinct,
           CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len
    FROM s
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token count, type-token ratio, stopword
    ratio, avg token length — single-scan column math (ratios of exact
    ints ⇒ bit-identical cross-engine)."""
    d = tbl(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (n_distinct.cast("double") / n_tokens).alias("ttr"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
    )


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
                WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
                WHEN regexp_matches(text, '[äößü]') THEN 'de'
                WHEN regexp_matches(text, '(^| )(the|a)( |$)') THEN 'en'
                ELSE 'und' END AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class + function-word language ID — the standard
    lightweight langid heuristic (script ranges first, then function
    words). Deterministic column CASE; the oracle mirrors it exactly."""
    d = tbl(spark, sf_dir, "documents")
    t = F.col("text")
    pred = (
        F.when(t.rlike("[一-鿿]"), "zh")
        .when(t.rlike("[áéíóúñ¿¡]"), "es")
        .when(t.rlike("[àâçèêëîïôùûœ]"), "fr")
        .when(t.rlike("[äößü]"), "de")
        .when(t.rlike("(^| )(the|a)( |$)"), "en")
        .otherwise("und")
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


@register(
    "text_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
      FROM documents
    )
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS rep_doc
    FROM fp GROUP BY fp HAVING COUNT(*) >= 1
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint clustering: docs sharing a sorted-token-set md5."""
    return (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_doc"))
    )


@register(
    "token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INTEGER) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation) — the standard
    pre-tokenizer shape used before byte-pair merging."""
    d = tbl(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokens("text")).alias("n_ws_tokens"),
    )


@register(
    "pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(
             regexp_replace('contact user' || user_id || '@example.com id=' || event_id,
                            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'id=[0-9]+', 'id=<ID>', 'g') AS scrubbed
    FROM events WHERE event_type = 'signup'
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the classic pre-training text hygiene pass:
    regex redaction of emails/ids as pure column expressions (one
    codegen'd scan; at 100 TB this is map-only, no shuffle). The
    synthetic message embeds an email so the scrubber has real work."""
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    msg = F.concat(
        F.lit("contact user"),
        F.col("user_id"),
        F.lit("@example.com id="),
        F.col("event_id"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            msg, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        ),
        r"id=[0-9]+",
        "id=<ID>",
    )
    return ev.select("event_id", scrubbed.alias("scrubbed"))


@register(
    "error_rate_alert",
    oracle="""
    WITH w AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 600) * 600000000 AS BIGINT)) AS win_start,
             COUNT(*) AS n_total,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
      FROM events GROUP BY 1
    )
    SELECT win_start, n_total, n_errors,
           CAST(n_errors AS DOUBLE) / n_total AS error_rate
    FROM w
    WHERE CAST(n_errors AS DOUBLE) / n_total > 0.25
    """,
)
def error_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed error-rate alerting — THE log-analytics query this
    table shape exists for: tumbling windows, conditional aggregation,
    rate threshold. Streaming twin: same plan + watermark in
    streaming.windowed_stream."""
    win = F.window(F.col("ts"), "10 minutes")
    w = (
        tbl(spark, sf_dir, "events")
        .groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
    )
    rate = F.col("n_errors").cast("double") / F.col("n_total")
    return (
        w.select(
            F.col("w.start").alias("win_start"),
            "n_total",
            "n_errors",
            rate.alias("error_rate"),
        )
        .filter(F.col("error_rate") > 0.25)
    )


@register(
    "classifier_eval",
    oracle="""
    WITH pred AS (
      SELECT lang,
             CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                  WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
                  WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
                  WHEN regexp_matches(text, '[äößü]') THEN 'de'
                  WHEN regexp_matches(text, '(^| )(the|a)( |$)') THEN 'en'
                  ELSE 'und' END AS lang_pred
      FROM documents WHERE lang IS NOT NULL
    ), cm AS (
      SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2
    )
    SELECT lang, lang_pred, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY lang), 6) AS recall_share,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY lang_pred), 6)
             AS precision_share
    FROM cm
    """,
)
def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier audit as a query: the confusion matrix of the
    lang-id heuristic (text_lang_id's exact predictor) against the
    ground-truth `lang` column, with each cell's share of its true
    row (recall when lang_pred == lang) and of its predicted column
    (precision on the diagonal) — the eval loop every quality/lang
    classifier in a curation pipeline needs, run where the data
    lives instead of exporting samples.

    Shape: predictor is a codegen'd scan CASE; one (truth, pred)
    count agg (partial-combined); the share windows run over the
    ≤ |langs|² aggregated matrix. Exact integer counts → identical
    float divisions in both engines."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    t = F.col("text")
    pred = (
        F.when(t.rlike("[一-鿿]"), "zh")
        .when(t.rlike("[áéíóúñ¿¡]"), "es")
        .when(t.rlike("[àâçèêëîïôùûœ]"), "fr")
        .when(t.rlike("[äößü]"), "de")
        .when(t.rlike("(^| )(the|a)( |$)"), "en")
        .otherwise("und")
    )
    from pyspark.sql import Window as _W

    cm = (
        d.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
    return cm.select(
        "lang",
        "lang_pred",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(_W.partitionBy("lang")),
            6,
        ).alias("recall_share"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(_W.partitionBy("lang_pred")),
            6,
        ).alias("precision_share"),
    )


_TRI_TOPK = 5


@register(
    "char_trigram_profile",
    oracle=f"""
    WITH tris AS (
      SELECT lang,
             unnest(list_transform(
               range(1, greatest(length(text) - 2, 0) + 1),
               i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
      FROM documents WHERE lang IS NOT NULL
    ), counts AS (
      SELECT lang, tri, COUNT(*) AS n FROM tris GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, tri, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, tri) AS rnk
      FROM counts
    )
    SELECT lang, CAST(rnk AS INTEGER) AS rnk, tri, n
    FROM ranked WHERE rnk <= {_TRI_TOPK}
    """,
)
def char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile (top-{k} trigrams by
    frequency) — the statistical basis of real language ID (Cavnar &
    Trenkle 1994's n-gram profiles; text_lang_id's regex heuristic is
    the cheap approximation, THIS is the model it approximates). The
    profile doubles as a corpus-drift reference: compare per-batch
    profiles against it to spot encoding bugs or language mislabels.

    Trigrams are built INSIDE the row (sequence+transform slicing —
    codegen'd, no per-character explode), so the only corpus-wide
    stage is the (lang, trigram) count agg; ranking windows run on
    the aggregated profile, partitioned by lang."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    # sequence end is INCLUSIVE (and descends for end < start — the
    # shingles() trap), so guard short texts explicitly: positions
    # 1..len-2, empty array under 3 chars
    n_pos = F.length("text") - 2
    tris = F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.substring(F.col("text"), i, 3),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select("lang", F.explode(tris).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("lang").orderBy(F.desc("n"), F.asc("tri"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TRI_TOPK)
        .select("lang", "rnk", "tri", "n")
    )


char_trigram_profile.__doc__ = char_trigram_profile.__doc__.format(k=_TRI_TOPK)
