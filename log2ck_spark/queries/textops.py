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
