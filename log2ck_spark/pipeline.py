"""Pipeline assembly: source → parse → filter → callback → enrich.

One transform chain shared by batch (`spark.read.text`) and streaming
(`spark.readStream.text`) — the reference's Worker line path
(SURVEY.md §3 EP2) as a single declarative plan. The whole chain is
column expressions unless a pandas callback is configured, so a 100 TB
backfill is one codegen'd scan stage.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.config import EngineConfig, TailSpec
from log2ck_spark.parse import enrich, parse_lines, split_valid, with_log_date


def expand_date_macro(path: str, today: date | None = None) -> str:
    """`{date}` → today's Y-m-d (reference Manager.php:82-85,
    readme.md:79 — the only supported path macro). BATCH semantics:
    one day's snapshot, resolved at call time."""
    return path.replace("{date}", (today or date.today()).isoformat())


def stream_date_glob(path: str) -> str:
    """`{date}` → a date-shaped GLOB for STREAMING paths. Resolving the
    macro to today's literal date at query construction freezes a
    long-running stream onto one day's file: at midnight all new lines
    go to the next day's file, which the bound query never discovers —
    silent ingestion stop (the reference re-resolves via its daily
    worker respawn, Manager.php:82-85; an engine-managed stream has no
    respawn). Both streaming sources re-expand globs every trigger, so
    the date-family glob rolls automatically; with follow=True,
    skiphistory pins files that pre-exist the stream at EOF (today's
    live file, yesterday's leftovers) and each NEW day's file is read
    from byte 0 — exactly the reference worker's behavior across
    midnight."""
    return path.replace(
        "{date}", "[0-9][0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9]"
    )


def transform_chain(
    lines: DataFrame, tail: TailSpec
) -> tuple[DataFrame, DataFrame]:
    """Apply parse → split → callback → enrich to a DataFrame of raw
    lines (column ``value``). Returns (rows, dead_letter).

    Order matches the reference exactly: regex (A4) → validity split
    (A5) → callback (A7) → enrichment overwrites callback output (A8,
    `Worker.php:142-148`). ``pattern=False`` (A6) skips the regex and
    hands the raw line to the callback.
    """
    if tail.pattern is False:
        rows = lines.select(F.col("value").alias("raw"))
        dead = lines.limit(0).select(F.col("value").alias("raw_line"))
    else:
        pattern_kwargs = {} if tail.pattern is None else {"pattern": tail.pattern}
        parsed = parse_lines(
            lines,
            "value",
            groups=tail.groups,
            ts_group=tail.ts_group,
            ts_format=tail.ts_format,
            **pattern_kwargs,
        )
        rows, dead = split_valid(parsed)

    if tail.callback is not None:
        rows = tail.callback(rows)
    if tail.pandas_callback is not None:
        rows = rows.mapInPandas(
            tail.pandas_callback, schema=tail.pandas_callback_schema
        )
    rows = enrich(rows, repo=tail.repo, name=tail.name, host=tail.host)
    if "created_at" in rows.columns:
        rows = with_log_date(rows)
    return rows, dead


def batch_pipeline(
    spark: SparkSession, config: EngineConfig, tail: TailSpec
) -> tuple[DataFrame, DataFrame]:
    """Batch analog of one Worker: read the (already-rotated) files for
    this tail and run the chain. Globbed paths subsume the reference's
    daily-rotation respawn dance (SURVEY.md §3 EP3)."""
    config.validate()
    lines = spark.read.text(expand_date_macro(tail.path))
    return transform_chain(lines, tail)


def stream_pipeline(
    spark: SparkSession, config: EngineConfig, tail: TailSpec
) -> tuple[DataFrame, DataFrame]:
    """Streaming source for one tail (A1/A3).

    Default (`follow=False`): the file source discovers newly
    closed/rotated files; `maxFilesPerTrigger` is the max_sent_count
    analog (A9) — the high-throughput bulk path.

    `follow=True`: the `tailf` custom source tails GROWING files with
    per-file byte offsets, partial-line buffering and start-at-EOF —
    the reference Worker's exact semantics (Worker.php:101-107,176);
    see log2ck_spark/sources/tailsource.py."""
    config.validate()
    if tail.follow:
        from log2ck_spark.sources import register_tail_source

        register_tail_source(spark)
        lines = (
            spark.readStream.format("tailf")
            .option("path", stream_date_glob(tail.path))
            .option("skiphistory", "true" if tail.skip_history else "false")
            .load()
            .select("value")
        )
    else:
        lines = (
            spark.readStream.option(
                "maxFilesPerTrigger", config.max_files_per_trigger
            ).text(stream_date_glob(tail.path))
        )
    return transform_chain(lines, tail)
