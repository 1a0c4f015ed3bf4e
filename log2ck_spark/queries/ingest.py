"""Part A ingestion operators as oracle-checked batch queries.

Strategy: deterministically render the `events` table into monolog
lines ("[ts] user_<id>.<LEVEL>: event <id> <json> []", the reference's
DEFAULT_PATTERN grammar, `/root/reference/src/Worker.php:25`), inject
invalid lines (event_id % 13 == 0), then run the REAL parse pipeline
(log2ck_spark.parse / pipeline) over them. The DuckDB oracle derives
the expected output directly from the events columns — an independent
derivation, so regex extraction, validity split, enrichment, callback
and sink layout are all cross-checked end-to-end.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
from log2ck_spark.functions.numeric import finite
from log2ck_spark.io import ensure_staged, scratch_dir, tbl
from log2ck_spark.parse import enrich, parse_lines, split_valid, with_log_date
from log2ck_spark.pipeline import transform_chain
from log2ck_spark.queries import register
from log2ck_spark.sink import write_batch

INVALID_MOD = 13  # event_id % 13 == 0 → rendered as a garbage line

# A file line is never NULL — at the real ingestion boundary the unit
# is a string read from disk. The synthetic corpora that STAND IN for
# those files are therefore defined over COMPLETE event rows only:
# rendering a NULL field through concat() nulls the whole line on
# Spark but skips the argument in DuckDB, so without this shared
# predicate the two engines would synthesize DIFFERENT corpora from
# the same events table and every downstream parse/count oracle would
# diverge on NULL-bearing fixtures (latent on the NULL-free driver
# fixtures; exercised by the hostile-fixture gate).
_CORPUS_FIELDS = ("event_id", "ts", "user_id", "event_type", "value", "props")
CORPUS_COMPLETE_SQL = " AND ".join(
    f"{c} IS NOT NULL" for c in _CORPUS_FIELDS
)

# A complete row can still render into a line the parser REJECTS: the
# monolog grammar's "<logger>.<LEVEL>" fields are (\w+) groups, and
# Java regex \w — like the reference's PCRE \w without /u
# (Worker.php:25 preg_match) — is ASCII-only, so a multibyte
# event_type (CJK/Cyrillic/emoji) dead-letters on BOTH the reference
# and this engine while a naive oracle derivation would count it as
# parsed (found by the r9 --unicode hostile gate: 5 oracles diverged).
# Oracles deriving PARSED monolog output must carry this predicate;
# raw line-count oracles must NOT (the unparseable line still lands in
# the file). logger is 'user_' || user_id (always ASCII); level is
# checked post-UPPER because that is the value the renderer embeds —
# NOTE the residual cross-engine corner here: Java's toUpperCase does
# full case mapping ('ß' → 'SS', parseable) while DuckDB's upper
# yields 'ẞ' (verified in-container; NOT parseable), so a full-casing
# character in event_type diverges. No generator or hostile fixture
# emits one; documented as out-of-contract in PARITY.md rather than
# guessed at in SQL. The context field is the space-stripped
# props rendered as a ([^ ]+) token — empty (or all-spaces) props
# render a double space the grammar cannot match, so the line
# dead-letters (found by the r9 --badjson gate). DuckDB-side SQL —
# the Spark side needs no twin because it parses with the real regex.
CORPUS_PARSEABLE_SQL = (
    "regexp_matches(upper(event_type), '^[A-Za-z0-9_]+$')"
    " AND REPLACE(props, ' ', '') <> ''"
)

# The accesslog/logfmt grammars embed event_type as an UNQUOTED token
# (a URL path segment / a bare k=v value), so a value containing
# whitespace is not representable — a real producer would %-encode or
# quote it; this minimal renderer excludes the row instead, on BOTH
# engines (found by the r10 --blank gate: a '  ' event_type rendered
# a space-bearing path that (\S+) truncated on one engine and the
# oracle rebuilt whole on the other, and a logfmt line whose empty
# tokens crashed str_to_map with duplicate '' keys). Java \s and
# DuckDB (RE2) \s are both ASCII whitespace classes, so the predicate
# twins exactly. Monolog needs no such guard: its \w+ grammar already
# rejects whitespace via CORPUS_PARSEABLE_SQL.
# Both spellings are plain SQL STRINGS, not Column objects: this
# module is re-imported inside Python workers when its Arrow callback
# deserializes, and F.col(...) at import time there has no session
# and crashes the worker (found live when the --blank sweep reached
# callback_transform).
SPACE_FREE_SQL = "NOT regexp_matches(event_type, '\\s')"
SPACE_FREE_SPARK_SQL = r"NOT event_type RLIKE '\\s'"


def _complete_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events", fanout=True).where(
        CORPUS_COMPLETE_SQL
    )


# Oracle-side derivation of the parsed columns, from events directly.
_ORACLE_PARSED = f"""
    SELECT DATE_TRUNC('second', ts) AS created_at,
           'user_' || user_id AS logger,
           UPPER(event_type) AS level,
           'event ' || event_id AS message,
           REPLACE(props, ' ', '') AS context,
           '[]' AS extra
    FROM events
    WHERE event_id % 13 <> 0 AND {CORPUS_COMPLETE_SQL}
      AND {CORPUS_PARSEABLE_SQL}
"""


def monolog_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → one monolog-format line per event; event_id%13==0 rows
    become non-matching garbage (exercises A5 dead-letter). Complete
    rows only (CORPUS_COMPLETE_SQL): a file line is never NULL."""
    ev = _complete_events(spark, sf_dir)
    line = F.concat(
        F.lit("["),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit("] user_"),
        F.col("user_id"),
        F.lit("."),
        F.upper("event_type"),
        F.lit(": event "),
        F.col("event_id"),
        F.lit(" "),
        F.regexp_replace("props", " ", ""),
        F.lit(" []"),
    )
    garbage = F.concat(F.lit("!! not a log line "), F.col("event_id"))
    return ev.select(
        F.when(F.col("event_id") % INVALID_MOD == 0, garbage)
        .otherwise(line)
        .alias("value")
    )


# --------------------------------------------------------------------------
# A1 ingest_text_lines — text source round-trip through a real file
# --------------------------------------------------------------------------


@register(
    "ingest_text_lines",
    oracle=f"SELECT COUNT(*) AS n_lines, COUNT(DISTINCT event_id) AS"
    f" n_distinct FROM events WHERE {CORPUS_COMPLETE_SQL}",
)
def ingest_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 batch analog: write the corpus as real text files, read them
    back with spark.read.text (the same source the streaming path
    tails), count. Streaming variant covered in tests/test_streaming."""
    path = ensure_staged(
        scratch_dir(sf_dir, "monolog_corpus"),
        lambda p: monolog_lines(spark, sf_dir).write.mode("overwrite").text(p),
    )
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("value").alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# A4 parse_monolog — regex extraction of every named group
# --------------------------------------------------------------------------


@register("parse_monolog", oracle=_ORACLE_PARSED)
def parse_monolog(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = monolog_lines(spark, sf_dir)
    valid, _dead = split_valid(parse_lines(lines))
    return valid.select(
        "created_at", "logger", "level", "message", "context", "extra"
    )


# --------------------------------------------------------------------------
# A5 filter_valid — validity split + dead-letter counts
# --------------------------------------------------------------------------


@register(
    "filter_valid",
    oracle=f"""
    SELECT COUNT(*) FILTER (WHERE event_id % 13 <> 0
                              AND {CORPUS_PARSEABLE_SQL}) AS n_valid,
           COUNT(*) FILTER (WHERE event_id % 13 = 0
                               OR NOT ({CORPUS_PARSEABLE_SQL})) AS n_dead
    FROM events WHERE {CORPUS_COMPLETE_SQL}
    """,
)
def filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_lines(monolog_lines(spark, sf_dir))
    valid, dead = split_valid(parsed)
    return valid.agg(F.count("*").alias("n_valid")).crossJoin(
        dead.agg(F.count("*").alias("n_dead"))
    )


# --------------------------------------------------------------------------
# A8 enrich_constants — repo/name/host stamping
# --------------------------------------------------------------------------


@register(
    "enrich_constants",
    oracle=f"""
    SELECT UPPER(event_type) AS level,
           'demo-repo' AS repo, 'events-tail' AS name, 'host-1' AS host,
           COUNT(*) AS n
    FROM events WHERE event_id % 13 <> 0 AND {CORPUS_COMPLETE_SQL}
      AND {CORPUS_PARSEABLE_SQL}
    GROUP BY 1
    """,
)
def enrich_constants(spark: SparkSession, sf_dir: str) -> DataFrame:
    valid, _ = split_valid(parse_lines(monolog_lines(spark, sf_dir)))
    enriched = enrich(valid, repo="demo-repo", name="events-tail", host="host-1")
    return enriched.groupBy("level", "repo", "name", "host").agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# A7 callback_transform — user transform as an Arrow-batched pandas fn
# --------------------------------------------------------------------------

_CALLBACK_SCHEMA = (
    "created_at timestamp, level_lower string, k int, msg_len int"
)


def _callback(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The reference's per-row callback (`Worker.php:142-144`) — here an
    Arrow-batched transform (never row-at-a-time Python)."""
    for pdf in batches:
        ks = []
        for ctx in pdf["context"]:
            try:
                ks.append(int(json.loads(ctx).get("k")))
            except (ValueError, TypeError, AttributeError):
                # ValueError: malformed JSON / non-numeric k;
                # TypeError: k absent (int(None)); AttributeError:
                # valid JSON with a non-object root ('[3, 4]'.get) —
                # found by the r9 --badjson gate
                ks.append(None)
        yield pd.DataFrame(
            {
                "created_at": pdf["created_at"],
                "level_lower": pdf["level"].str.lower(),
                "k": pd.array(ks, dtype="Int32"),
                "msg_len": pdf["message"].str.len().astype("int32"),
            }
        )


@register(
    "callback_transform",
    oracle=f"""
    SELECT DATE_TRUNC('second', ts) AS created_at,
           lower(upper(event_type)) AS level_lower,
           -- the renderer writes REPLACE(props, ' ', '') into the log
           -- line, so the callback parses the SPACE-STRIPPED JSON;
           -- extract from the same string here or values whose
           -- extraction changes under stripping (e.g. k = "1 2")
           -- diverge (r10 ADVICE fix)
           TRY_CAST(json_extract_string(
                    TRY_CAST(REPLACE(props, ' ', '') AS JSON), '$.k')
                    AS INTEGER) AS k,
           CAST(LENGTH('event ' || event_id) AS INTEGER) AS msg_len
    FROM events WHERE event_id % 13 <> 0 AND {CORPUS_COMPLETE_SQL}
      AND {CORPUS_PARSEABLE_SQL}
    """,
)
def callback_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    tail = TailSpec(
        name="events-tail",
        path="unused",
        repo="demo-repo",
        host="host-1",
        pandas_callback=_callback,
        pandas_callback_schema=_CALLBACK_SCHEMA,
    )
    rows, _dead = transform_chain(monolog_lines(spark, sf_dir), tail)
    return rows.select("created_at", "level_lower", "k", "msg_len")


# --------------------------------------------------------------------------
# A6 raw passthrough — pattern=False hands raw lines to the callback
# --------------------------------------------------------------------------


@register(
    "raw_passthrough",
    oracle=f"""
    SELECT CAST(LENGTH(CASE WHEN event_id % 13 = 0
                  THEN '!! not a log line ' || event_id
                  ELSE '[' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '] user_' || user_id
                       || '.' || UPPER(event_type) || ': event ' || event_id || ' '
                       || REPLACE(props, ' ', '') || ' []' END) AS INTEGER) AS line_len,
           COUNT(*) AS n
    FROM events WHERE {CORPUS_COMPLETE_SQL}
    GROUP BY 1
    """,
)
def raw_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: pattern=False skips the regex (`Worker.php:138-140`,
    readme.md:81); the callback sees the raw line."""
    tail = TailSpec(
        name="raw-tail",
        path="unused",
        pattern=False,
        callback=lambda df: df.select(
            F.length("raw").cast("int").alias("line_len")
        ),
    )
    rows, _ = transform_chain(monolog_lines(spark, sf_dir), tail)
    return rows.groupBy("line_len").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# A10/B1/B2 sink_table — partitioned+sorted sink, read back and verified
# --------------------------------------------------------------------------


@register(
    "sink_table",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS log_date,
           UPPER(event_type) AS level,
           COUNT(*) AS n
    FROM events WHERE event_id % 13 <> 0 AND {CORPUS_COMPLETE_SQL}
      AND {CORPUS_PARSEABLE_SQL}
    GROUP BY 1, 2
    """,
)
def sink_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow: parse → filter → enrich → write the
    date-partitioned sorted sink (the MergeTree-layout analog) → read
    it back and aggregate. What lands on disk is what's counted."""
    valid, _ = split_valid(parse_lines(monolog_lines(spark, sf_dir)))
    table = with_log_date(
        enrich(valid, repo="demo-repo", name="events-tail", host="host-1")
    )
    sink = SinkConfig(path=scratch_dir(sf_dir, "sink_table"))
    write_batch(table, sink)
    # Read back under the writer's schema: inference fails on the
    # zero-row case (partitionBy writes no data files), and an
    # explicit schema also skips the footer-sampling job.
    back = spark.read.schema(table.schema).parquet(sink.path)
    return back.groupBy(
        F.date_format("log_date", "yyyy-MM-dd").alias("log_date"), F.col("level")
    ).agg(F.count("*").alias("n"))


@register(
    "ingest_tail_snapshot",
    oracle=f"SELECT COUNT(*) AS n_lines, COUNT(DISTINCT event_id) AS"
    f" n_distinct FROM events WHERE {CORPUS_COMPLETE_SQL}",
)
def ingest_tail_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 via the `tailf` custom source's BATCH reader: write the
    corpus as real log files, read them back with
    spark.read.format('tailf'), count — the same contract as
    ingest_text_lines but through the tailing source, so the custom
    DataSource's read path gets its own driver-checked row (the
    streaming path is exercised in tests/test_tail_source.py)."""
    from log2ck_spark.sources import register_tail_source

    path = ensure_staged(
        scratch_dir(sf_dir, "tail_snapshot_corpus"),
        lambda p: monolog_lines(spark, sf_dir).write.mode("overwrite").text(p),
    )
    register_tail_source(spark)
    lines = (
        spark.read.format("tailf")
        .option("path", path + "/*.txt")
        .load()
    )
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("value").alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# Format connectors: JSONL and CSV round-trips (filebeat-style inputs)
# --------------------------------------------------------------------------

_EVENTS_JSON_SCHEMA = (
    "event_id bigint, ts_s string, user_id bigint, event_type string, "
    "value double, props string"
)

_ORACLE_EVENTS_ROUNDTRIP = """
    SELECT event_id,
           strftime(DATE_TRUNC('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
           user_id, event_type, value,
           TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                    AS INTEGER) AS prop_k
    FROM events
"""


@register("ingest_jsonl", oracle=_ORACLE_EVENTS_ROUNDTRIP)
def ingest_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines connector round-trip: render `events` to real .jsonl
    files, read them back with an EXPLICIT schema, and re-derive every
    column (including a JSON field extraction from the nested props
    payload) — the structured-log sibling of the monolog regex path.
    Complements `relational2.ingest_json_lines`, which checks the same
    source at aggregate level: this one is ROW-level and carries the
    quoting-hostile props payload + timestamp formatting through the
    serialize/parse cycle.

    Scale notes: the reader gets a declared schema — schema inference
    is a full extra pass over the data (fatal at 100 TB) and can
    widen types differently per day's files; and JSONL splits by
    newline, so unlike multi-line JSON the scan parallelizes per
    block. The oracle derives the expected rows from the events view
    independently, so serialization, quoting, and type round-trips
    are all cross-checked."""
    def _stage(p: str) -> None:
        ev = tbl(spark, sf_dir, "events", fanout=True)
        ev.select(
            F.to_json(
                F.struct(
                    F.col("event_id"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
                    F.col("user_id"),
                    F.col("event_type"),
                    F.col("value"),
                    F.col("props"),
                )
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_staged(scratch_dir(sf_dir, "events_jsonl"), _stage)
    back = spark.read.schema(_EVENTS_JSON_SCHEMA).json(path)
    return back.select(
        "event_id",
        "ts_s",
        "user_id",
        "event_type",
        "value",
        # try_cast: non-numeric k must be NULL, not an ANSI crash
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
    )


@register("ingest_csv", oracle=_ORACLE_EVENTS_ROUNDTRIP)
def ingest_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector round-trip: same contract as ingest_jsonl through
    the CSV reader/writer — exercises quoting (the props payload
    carries quotes and braces inside a quoted field), explicit-schema
    reads, and type coercion. Headerless with a declared schema: at
    scale a header row per file is both a skew hazard (every task
    skips it) and an inference trap."""
    def _stage(p: str) -> None:
        ev = tbl(spark, sf_dir, "events", fanout=True)
        # Faithful round-trip options (--blank gate): the writer's
        # DEFAULTS trim leading/trailing whitespace from every field
        # (a '  ' payload silently became ''), and the default
        # nullValue="" makes '' unreadable as distinct from NULL. A
        # connector must not rewrite payloads: keep whitespace, and
        # spell NULL as the classic \N sentinel on both sides so the
        # empty string survives as itself.
        ev.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).write.mode("overwrite").option("header", "false").option(
            "ignoreLeadingWhiteSpace", "false"
        ).option("ignoreTrailingWhiteSpace", "false").option(
            "nullValue", "\\N"
        ).csv(p)

    path = ensure_staged(scratch_dir(sf_dir, "events_csv"), _stage)
    back = (
        spark.read.schema(_EVENTS_JSON_SCHEMA)
        .option("header", "false")
        .option("nullValue", "\\N")
        .csv(path)
    )
    return back.select(
        "event_id",
        "ts_s",
        "user_id",
        "event_type",
        "value",
        # try_cast: non-numeric k must be NULL, not an ANSI crash
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
    )


@register("ingest_orc", oracle=_ORACLE_EVENTS_ROUNDTRIP)
def ingest_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector round-trip: same contract as ingest_jsonl/csv
    through the columnar ORC reader/writer — the second columnar
    format next to parquet (type-preserving, so unlike the text
    formats nothing is re-parsed on read; the ts string column is
    still carried to keep the three connectors result-identical).
    At 100 TB ORC gives the same pruned columnar scan properties as
    parquet (stripe stats, dictionary encoding); this query proves
    the engine is format-agnostic at the storage boundary."""
    def _stage(p: str) -> None:
        ev = tbl(spark, sf_dir, "events", fanout=True)
        ev.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).write.mode("overwrite").orc(p)

    path = ensure_staged(scratch_dir(sf_dir, "events_orc"), _stage)
    back = spark.read.orc(path)
    return back.select(
        "event_id",
        "ts_s",
        "user_id",
        "event_type",
        "value",
        # try_cast: non-numeric k must be NULL, not an ANSI crash
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# A4 custom-pattern variants — Apache combined access log and logfmt.
# The reference's `pattern` override (`readme.md:81`) means any line
# grammar with capture groups can drive the same parse pipeline; these
# two exercise that contract with the two most common non-monolog log
# shapes, through the SAME parse_lines machinery (no per-format code).
# --------------------------------------------------------------------------

ACCESSLOG_PATTERN = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\w+) (\S+) [^"]+" (\d+) (\d+)$'
)
ACCESSLOG_GROUPS = (
    "ip", "http_user", "created_at", "method", "path", "status", "bytes"
)
ACCESSLOG_TS_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"


def accesslog_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Apache combined-log lines (garbage on event_id%13==0,
    same dead-letter injection as the monolog corpus). Complete rows
    only (CORPUS_COMPLETE_SQL), grammar-representable event_types only
    (SPACE_FREE_SQL — a raw space cannot live in an unencoded URL
    path): a file line is never NULL and never self-truncating.
    Finite values only (--nonfinite): the bytes field is (\\d+), and
    Spark's floor SATURATES non-finite doubles (nan → 0, inf →
    Long.MAX) into silently-wrong parseable digits rather than a
    dead-letterable token — a faithful accesslog corpus cannot carry
    them, so exclude at render time on both engines (the SPACE_FREE
    precedent)."""
    ev = (
        _complete_events(spark, sf_dir)
        .where(SPACE_FREE_SPARK_SQL)
        .where(finite("value"))
    )
    line = F.concat(
        F.lit("10.0.0."), F.col("user_id") % 50,
        F.lit(" - u"), F.col("user_id"),
        F.lit(" ["), F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        F.lit(" +0000] \"GET /e/"), F.col("event_type"),
        F.lit("/"), F.col("event_id"),
        F.lit(" HTTP/1.1\" "),
        F.when(F.col("event_type") == "error", 500).otherwise(200),
        F.lit(" "), F.floor(F.col("value") * 10).cast("bigint"),
    )
    garbage = F.concat(F.lit("corrupt "), F.col("event_id"))
    return ev.select(
        F.when(F.col("event_id") % INVALID_MOD == 0, garbage)
        .otherwise(line)
        .alias("value")
    )


@register(
    "parse_accesslog",
    oracle=rf"""
    SELECT '10.0.0.' || (user_id % 50) AS ip,
           'u' || user_id AS http_user,
           DATE_TRUNC('second', ts) AS created_at,
           'GET' AS method,
           '/e/' || event_type || '/' || event_id AS path,
           CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status,
           CAST(floor(value * 10) AS BIGINT) AS bytes
    FROM events
    WHERE event_id % 13 <> 0 AND {CORPUS_COMPLETE_SQL}
      -- the grammar's bytes group is (\d+): a NEGATIVE rendered value
      -- cannot match, so the engine dead-letters the line — mirror
      -- that here or big negative metric values diverge (r10 --bignum).
      -- The CASE guard mirrors the renderer's finite-only corpus
      -- (--nonfinite): non-finite → NULL → excluded, and DuckDB never
      -- evaluates floor over a NaN it would refuse to cast (WHERE
      -- conjunct order is not guaranteed, so the guard must be INSIDE
      -- the floor conjunct, not a sibling isfinite AND).
      AND floor(CASE WHEN isfinite(value) THEN value END * 10) >= 0
      AND {SPACE_FREE_SQL}
    """,
)
def parse_accesslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 with a custom pattern: Apache combined access-log grammar
    through the same parse_lines/split_valid pipeline as monolog —
    the reference's `pattern` override contract (`readme.md:81`,
    `Worker.php:25` swapped at config time). Timestamp format carries
    an explicit zone offset; status/bytes are typed post-extract (the
    sink-side typing the reference delegates to ClickHouse DDL,
    SURVEY.md §1.2). Still one codegen'd scan — a 100 TB access-log
    re-parse shuffles nothing."""
    lines = accesslog_lines(spark, sf_dir)
    parsed = parse_lines(
        lines,
        pattern=ACCESSLOG_PATTERN,
        groups=ACCESSLOG_GROUPS,
        ts_format=ACCESSLOG_TS_FORMAT,
    )
    valid, _dead = split_valid(parsed)
    return valid.select(
        "ip",
        "http_user",
        "created_at",
        "method",
        "path",
        F.col("status").cast("int").alias("status"),
        F.col("bytes").cast("bigint").alias("bytes"),
    )


def logfmt_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → logfmt ``k=v`` lines (the Heroku/Go ecosystem's
    structured-log grammar). Complete rows only (CORPUS_COMPLETE_SQL),
    grammar-representable event_types only (SPACE_FREE_SQL — a bare
    k=v value cannot carry an unquoted space)."""
    ev = _complete_events(spark, sf_dir).where(SPACE_FREE_SPARK_SQL)
    return ev.select(
        F.concat(
            F.lit("ts="), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(" user=u"), F.col("user_id"),
            F.lit(" type="), F.col("event_type"),
            F.lit(" value="), F.col("value").cast("string"),
            F.lit(" id="), F.col("event_id"),
        ).alias("value")
    )


@register(
    "parse_logfmt",
    oracle=f"""
    SELECT DATE_TRUNC('second', ts) AS created_at,
           user_id, event_type,
           value, event_id
    FROM events WHERE {CORPUS_COMPLETE_SQL} AND {SPACE_FREE_SQL}
    """,
)
def parse_logfmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logfmt parsing WITHOUT a regex per field: one `str_to_map`
    builds the key→value map per line, fields are then typed map
    lookups — the idiomatic Spark shape for self-describing k=v logs
    (arbitrary/unknown keys survive in the map; contrast with the
    fixed-group regex path). All JVM-side string ops in one codegen'd
    scan; the double round-trips value→string→double exactly in both
    engines."""
    lines = logfmt_lines(spark, sf_dir)
    # trim + collapse space runs BEFORE splitting: a line with doubled
    # spaces otherwise yields empty tokens, whose duplicate '' map
    # keys RAISE under Spark's default EXCEPTION dedup policy — a
    # parser must tolerate sloppy spacing, not crash on it (--blank
    # gate). No-op on well-formed single-space lines.
    m = F.expr("str_to_map(trim(regexp_replace(value, ' +', ' ')), ' ', '=')")
    return lines.select(m.alias("kv")).select(
        F.to_timestamp(
            F.col("kv")["ts"], "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("created_at"),
        F.substring(F.col("kv")["user"], 2, 100).cast("bigint").alias("user_id"),
        F.col("kv")["type"].alias("event_type"),
        F.col("kv")["value"].cast("double").alias("value"),
        F.col("kv")["id"].cast("bigint").alias("event_id"),
    )
