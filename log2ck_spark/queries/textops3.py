"""Corpus-filtering operators round 3 (SURVEY.md §2 C4 extension):
the Gopher/C4-style document quality rules a pretraining data pipeline
applies before dedup (Rae et al. 2021 "Scaling Language Models" App. A
— public method). All pure column expressions over one `documents`
scan; both queries are fully DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.plan import array_compute_once
from log2ck_spark.functions.text import bound, shingles, tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# Thresholds sized to the fixture distribution (10-99 tokens/doc) the
# way Gopher's were sized to web text; the SHAPE of the rules is what
# this operator demonstrates.
_MIN_WORDS, _MAX_WORDS = 15, 90
_MAX_DUP_TOKEN_FRAC = 0.55
_MIN_MEAN_WORD_LEN, _MAX_MEAN_WORD_LEN = 3.0, 8.0


@register(
    "text_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(list_distinct([array_to_string(toks[i:i+1], ' ')
                                for i in range(1, greatest(len(toks) - 1, 0) + 1)]))
               AS n_distinct_bigrams
      FROM tok
    ), freq AS (
      SELECT doc_id, MAX(cnt) AS top_cnt FROM (
        SELECT doc_id, t, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
        GROUP BY doc_id, t
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS INTEGER) AS n_tokens,
           1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens AS dup_token_frac,
           CAST(f.top_cnt AS DOUBLE) / b.n_tokens AS top_token_frac,
           CASE WHEN b.n_tokens > 1
                THEN 1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / (b.n_tokens - 1)
                ELSE 0.0 END AS dup_bigram_frac
    FROM base b JOIN freq f USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition filters):
    duplicate-token fraction, most-frequent-token fraction, duplicate-
    bigram fraction.

    Shape (r13, guide §2.4): ZERO shuffles. The top-token count is a
    per-row expression — the max run length of the SORTED token array,
    folded with one higher-order `aggregate` — so the old
    explode + (doc, token) hash agg + per-doc MAX + join-back (two
    exchanges and a second corpus pass) collapses into the same single
    projection that already computes the distinct/bigram fractions.
    O(n log n) per doc instead of a corpus shuffle; at 10^10 docs the
    query is embarrassingly parallel. The NULL filters reproduce the
    old inner join exactly: a NULL text exploded to no rows and a NULL
    doc_id never equi-joined, so both dropped from the output (same in
    the DuckDB oracle's JOIN USING). Fixture doc_ids are unique
    (per-row == per-doc); a duplicated doc_id would have merged counts
    across rows in the old join shape."""
    d = tbl(spark, sf_dir, "documents", fanout=True)
    toks = tokens("text")
    zero = F.lit(0).cast("bigint")
    top_cnt = bound(
        F.array_sort(toks),
        lambda s: F.aggregate(
            s,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                zero.alias("run"),
                zero.alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1).cast("bigint"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                        F.lit(1).cast("bigint")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        ),
    )
    return d.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(shingles("text", w=2)).alias("n_distinct_bigrams"),
        top_cnt.alias("top_cnt"),
    ).select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "dup_token_frac"
        ),
        (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
        F.when(
            F.col("n_tokens") > 1,
            F.lit(1.0)
            - F.col("n_distinct_bigrams").cast("double") / (F.col("n_tokens") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


_KGRAM = 5  # winnowing: k-gram width (tokens)
_WINNOW_W = 4  # window of consecutive k-gram hashes; one min kept per window

# Shared CTE: per-doc sorted distinct winnowed fingerprint set (see
# text_winnow_fingerprint for the algorithm) — reused by the
# fingerprint query and the containment join oracle.
_ORACLE_WINNOW_SETS = f"""
    tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), kh AS (
      SELECT doc_id,
             [CAST(('0x' || substr(md5(array_to_string(
                  toks[i:i+{_KGRAM - 1}], ' ')), 1, 15)) AS BIGINT)
              for i in range(1, greatest(len(toks) - {_KGRAM - 1}, 0) + 1)] AS h
      FROM tok
    ), win AS (
      SELECT doc_id,
             list_sort(list_distinct(
               [list_min(h[i:i+{_WINNOW_W - 1}])
                for i in range(1, greatest(len(h) - {_WINNOW_W - 1}, 0) + 1)]
             )) AS fp
      FROM kh
    )
"""


def _winnow_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp: array<bigint>) — each doc's distinct sorted
    winnowed fingerprint set, one LINEAR codegen'd expression per row:
    the token array and the k-gram hash array are let-bound with
    `functions.text.bound`, so the sliding-window lambdas slice a
    MATERIALIZED array instead of re-evaluating the upstream transform
    once per window. (Separate selects do NOT give that guarantee —
    CollapseProject inlines them; the unbound form measured quadratic
    per document: 90 s vs 6 s for the containment join at sf0.1.)"""
    d = tbl(spark, sf_dir, "documents", fanout=True)

    def _khashes(toks):
        n = F.size(toks)
        kidx = F.sequence(F.lit(1), n - F.lit(_KGRAM - 1))
        kh = lambda i: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.array_join(F.slice(toks, i, _KGRAM), " ")), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
        )
        return F.when(n >= _KGRAM, F.transform(kidx, kh)).otherwise(
            F.array().cast("array<bigint>")
        )

    def _window_min(h):
        nh = F.size(h)
        widx = F.sequence(F.lit(1), nh - F.lit(_WINNOW_W - 1))
        return F.array_sort(
            F.array_distinct(
                F.when(
                    nh >= _WINNOW_W,
                    F.transform(
                        widx, lambda i: F.array_min(F.slice(h, i, _WINNOW_W))
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            )
        )

    fp = bound(tokens("text"), lambda toks: bound(_khashes(toks), _window_min))
    return d.select("doc_id", fp.alias("fp"))


@register(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH {_ORACLE_WINNOW_SETS}
    SELECT doc_id,
           CAST(len(fp) AS INTEGER) AS n_fingerprints,
           -- COALESCE: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' — a zero-fingerprint doc
           -- (fewer than k tokens, e.g. short CJK text under the
           -- space tokenizer) must digest as md5('') on both engines
           md5(COALESCE(array_to_string(fp, ','), '')) AS fp_digest
    FROM win
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm, public): hash every token k-gram
    with a portable 60-bit md5-derived hash, slide a window of
    _WINNOW_W consecutive hashes, keep each window's minimum. The
    selected set is position-robust — two documents sharing a long
    span share fingerprints regardless of offset — which is what makes
    it the standard containment/overlap detector (vs `text_fingerprint`
    which hashes the whole doc).

    Construction details live in `_winnow_sets` (bound arrays, short-
    doc guards). Emitted as (count, digest of the sorted set) per doc
    so the oracle compares the exact set without hashing array-typed
    columns."""
    return _winnow_sets(spark, sf_dir).select(
        "doc_id",
        F.size("fp").cast("int").alias("n_fingerprints"),
        F.md5(F.array_join(F.col("fp").cast("array<string>"), ",")).alias(
            "fp_digest"
        ),
    )


_MIN_SHARED = 2  # containment: pairs sharing at least this many fingerprints


@register(
    "dedup_winnow_containment",
    oracle=f"""
    WITH {_ORACLE_WINNOW_SETS}
    , posting AS (
      SELECT doc_id, unnest(fp) AS h FROM win
    ), rare AS (
      SELECT * FROM posting
      WHERE h NOT IN (SELECT h FROM posting GROUP BY h HAVING COUNT(*) > 50)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS shared
    FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_MIN_SHARED}
    """,
)
def dedup_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOSS MATCH step: document pairs sharing >= {m} winnowed
    fingerprints — the containment/partial-overlap detector that
    set-level near-dup (Jaccard) misses when a long span hides inside
    an otherwise-different document.

    Shape: the group-once bucket joiner (`dedup.pairs_expr`) over the
    winnowed ~1/w-sampled posting list — ONE pass over the winnowing
    pipeline and ONE shuffle (groupBy h), where the previous
    formulation self-joined the posting table (winnow pipeline
    computed twice, shuffled twice) plus a separate df-table pass for
    the stop cut. Here the df cut is FREE: a fingerprint's document
    list is already in hand after the grouping, so buckets larger than
    _MAX_DF (ubiquitous boilerplate spans — the skew risk at corpus
    scale) are dropped by a size filter before any pair expansion."""
    from log2ck_spark.queries.dedup import pairs_expr

    max_df = 50
    # array_compute_once (r13): without the taint the optimizer's
    # inferred size/notnull filter re-runs the ENTIRE winnow pipeline
    # twice more per row, single-task below the fanout exchange —
    # posting stage measured 0.88 → 0.23 s, full kernel 1.23 → 0.83.
    posting = _winnow_sets(spark, sf_dir).select(
        "doc_id", F.explode(array_compute_once(F.col("fp"))).alias("h")
    )
    grouped = (
        posting.groupBy("h")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_df))
    )
    return (
        grouped.select(F.explode(pairs_expr("ids")).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= _MIN_SHARED)
    )


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents
    ), m AS (
      SELECT doc_id, lang, source,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             CAST(len(array_to_string(toks, '')) AS DOUBLE) / len(toks)
               AS mean_word_len,
             len(list_filter(toks, t -> t IN ('a', 'the'))) AS n_stop
      FROM s
    )
    SELECT doc_id, lang, source,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(n_tokens BETWEEN {_MIN_WORDS} AND {_MAX_WORDS} AS INTEGER)
             AS ok_word_count,
           CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
                <= {_MAX_DUP_TOKEN_FRAC} AS INTEGER) AS ok_repetition,
           CAST(mean_word_len BETWEEN {_MIN_MEAN_WORD_LEN}
                AND {_MAX_MEAN_WORD_LEN} AS INTEGER) AS ok_word_len,
           CAST(n_stop > 0 AS INTEGER) AS ok_stopwords,
           CAST(n_tokens BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
            AND 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
                <= {_MAX_DUP_TOKEN_FRAC}
            AND mean_word_len BETWEEN {_MIN_MEAN_WORD_LEN}
                AND {_MAX_MEAN_WORD_LEN}
            AND n_stop > 0 AS INTEGER) AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate: each rule emitted as its own flag
    (so a pipeline can audit WHICH rule dropped a doc — the standard
    practice) plus the conjunctive `keep`. One scan, pure column math;
    as a filter at 100 TB this is a codegen'd predicate the scan
    evaluates in place."""
    d = tbl(spark, sf_dir, "documents")
    toks_bound = d.select("doc_id", "lang", "source", tokens("text").alias("toks"))
    m = toks_bound.select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        (
            F.length(F.array_join("toks", "")).cast("double") / F.size("toks")
        ).alias("mean_word_len"),
        F.size(F.filter("toks", lambda t: t.isin("a", "the"))).alias("n_stop"),
    )
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")
    ok_wc = F.col("n_tokens").between(_MIN_WORDS, _MAX_WORDS)
    ok_rep = dup_frac <= _MAX_DUP_TOKEN_FRAC
    ok_wl = F.col("mean_word_len").between(_MIN_MEAN_WORD_LEN, _MAX_MEAN_WORD_LEN)
    ok_stop = F.col("n_stop") > 0
    return m.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        ok_wc.cast("int").alias("ok_word_count"),
        ok_rep.cast("int").alias("ok_repetition"),
        ok_wl.cast("int").alias("ok_word_len"),
        ok_stop.cast("int").alias("ok_stopwords"),
        (ok_wc & ok_rep & ok_wl & ok_stop).cast("int").alias("keep"),
    )
