"""Monolog line parsing — the reference's per-line hot loop, declarative.

Reference semantics reproduced (SURVEY.md §2 Part A):
* A4 regex extract: the reference matches each line against a monolog
  pattern with named capture groups and keeps only the named captures
  (`/root/reference/src/Worker.php:25,:134-137`). Here: ONE regex
  pass rewrites the line into a \\x01-separated field string
  (`regexp_replace` with $1..$N backrefs) that a cheap `split` fans
  into columns, plus one `rlike` pass for validity — 2 regex
  executions per line instead of the naive N+1 per-group
  `regexp_extract` shape (measured 1.9x on the 7-group access-log
  grammar; the per-line regex loop IS the reference's hot path, so
  this is the multiplier that carries to a 100 TB re-parse).
  JVM-side, whole-stage-codegen'd either way.
* A5 invalid-line filter + dead-letter: non-matching lines are dropped
  and logged (`Worker.php:154-156`); we split them into a dead-letter
  DataFrame instead.
* A8 literal enrichment: `repo`/`name`/`host` stamped on every row
  **after** the callback, overwriting it (`Worker.php:146-148`).

Java named groups reject underscores, so the pattern uses positional
groups paired with ``MONOLOG_GROUPS`` (same order as the reference's
named captures).

Scale: pure column expressions — no Python in the hot path; a 100 TB
re-parse is a single codegen'd scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Monolog default line grammar: "[%datetime%] %channel%.%level_name%:
# %message% %context% %extra%" (reference DEFAULT_PATTERN,
# /root/reference/src/Worker.php:25; one event per line, readme.md:19-21).
MONOLOG_PATTERN = r"^\[([^\]]*)\] (\w+)\.(\w+): (.*[^ ]) ([^ ]+) ([^ ]+)$"
MONOLOG_GROUPS = ("created_at", "logger", "level", "message", "context", "extra")
MONOLOG_TS_FORMAT = "yyyy-MM-dd HH:mm:ss"

# Field separator for the single-pass extract rewrite. ASCII SOH:
# absent from every text log grammar; lines containing it dead-letter.
_SEP = "\x01"


def parse_lines(
    df: DataFrame,
    line_col: str = "value",
    pattern: str = MONOLOG_PATTERN,
    groups: tuple[str, ...] = MONOLOG_GROUPS,
    ts_group: str | None = "created_at",
    ts_format: str = MONOLOG_TS_FORMAT,
) -> DataFrame:
    """Extract one column per capture group; adds boolean ``_valid``.

    ``ts_group`` (if set) is additionally typed to a timestamp — the
    reference leaves typing to ClickHouse's implicit coercion
    (SURVEY.md §1.2); Spark needs the explicit `to_timestamp`.

    Extraction is one `regexp_replace` into a ``\\x01``-joined field
    string + `split` (see module docstring). A line containing a
    literal ``\\x01`` would mis-split its own fields, so such lines
    are demoted to the dead letter — a deliberate, documented contract
    edge: \\x01 (ASCII SOH) does not occur in any text log grammar
    this engine parses, and a dead-lettered pathological line is
    recoverable while a silently mis-split one is not.

    Group columns are meaningful ONLY where ``_valid`` — consume
    through :func:`split_valid` (every in-repo caller does). On an
    unmatched line `regexp_replace` passes the raw line through, so
    its first "field" is the whole line and the rest coalesce to "".
    The columns are deliberately NOT wrapped in `when(_valid, ...)`
    guards: codegen's subexpression elimination cannot hoist from a
    conditional branch, so per-group guards re-run the replace+split
    once per column — measured 1.26x slower end-to-end than this
    unguarded shape, forfeiting most of the single-pass win. The win
    itself scales with pattern cost: ~2x on the backtracking-heavy
    7-group access-log grammar, roughly break-even on the trivial
    monolog one (array materialization offsets the saved passes).
    """
    line = F.col(line_col)
    repl = _SEP.join(f"${i}" for i in range(1, len(groups) + 1))
    # The rewrite must consume the WHOLE line around the FIRST match:
    # a bare regexp_replace rewrites every match in place, so an
    # UNANCHORED user pattern ('a=(\\d+) b=(\\d+)' on 'x a=1 b=2 y')
    # leaves the surrounding text fused into the edge groups
    # ('x 1', '2 y') and a twice-matching line fuses fields across
    # matches — silent corruption with _valid still true, where the
    # reference's preg_match extracts exact group contents. Wrapping
    # as ^.*?(?:pattern).*$ makes one replacement of the full line
    # with the first match's groups (the non-capturing wrap keeps
    # $1..$N numbering; for already-anchored patterns the lazy/greedy
    # wrappers match empty and the behavior is unchanged).
    full = f"^.*?(?:{pattern}).*$"
    parts = F.split(F.regexp_replace(line, full, repl), _SEP)
    cols: list[Column] = [line.alias("_raw")]
    for i, g in enumerate(groups):
        cols.append(F.coalesce(F.get(parts, i), F.lit("")).alias(g))
    out = df.select(
        *cols, (line.rlike(pattern) & ~line.contains(_SEP)).alias("_valid")
    )
    if ts_group and ts_group in groups:
        # try_to_timestamp: unparseable datetimes yield NULL (→ dead
        # letter) instead of failing the job under ANSI mode (Spark 4
        # default) — the reference's drop-and-log semantics, not abort
        out = out.withColumn(
            ts_group,
            F.when(
                F.col("_valid"), F.try_to_timestamp(F.col(ts_group), F.lit(ts_format))
            ),
        )
        # a line that matched the regex but carries an unparseable
        # datetime is invalid too (null created_at ⇒ dead-letter)
        out = out.withColumn(
            "_valid", F.col("_valid") & F.col(ts_group).isNotNull()
        )
    return out


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, dead_letter) — reference drops+logs invalid lines
    (`Worker.php:154-156`); we keep them addressable as a side output.

    The valid-side filter is wrapped in a non-pushable guard (r13).
    Unguarded, PushDownPredicates substitutes `_valid`'s defining
    expression into the filter and sinks it below the parse
    projection, so every input row pays the full regexp_replace +
    split + try_to_timestamp pipeline TWICE — once in the pushed
    filter, once again in the projection above it (codegen
    subexpression elimination shares within an operator, never across
    Filter and Project) — and locally the pushed filter additionally
    lands below the fanout exchange, single-tasking the regex work.
    The guard (functions.plan.filter_compute_once) is the guide-§4.4
    remedy spelled for built-in expressions: the tainted condition is
    a PROJECTED column, which is what actually blocks
    PushPredicateThroughNonJoin (a taint inside the filter condition
    still pushes through Projects — the first r13 wrapper was
    additionally constant-folded away entirely; see functions/plan.py
    for the verified mechanics). At 100 TB the duplication halves
    re-parse throughput, exchange or no exchange.

    The dead side stays unguarded: its projection keeps only the raw
    line, so the pushed-down filter is the single evaluation."""
    from log2ck_spark.functions.plan import filter_compute_once

    valid = filter_compute_once(parsed, F.col("_valid")).drop("_valid", "_raw")
    dead = parsed.filter(~F.col("_valid")).select(F.col("_raw").alias("raw_line"))
    return valid, dead


def enrich(
    df: DataFrame, repo: str, name: str, host: "str | None" = None
) -> DataFrame:
    """A8: stamp repo/name/host constants, overwriting any same-named
    columns the callback produced (reference order, `Worker.php:146-148`).
    host=None defaults to the machine's hostname — Worker.php:148
    defaults host to gethostname(), and this runs on the DRIVER (lit()
    is evaluated here, not per-executor), matching the reference's
    single-process model."""
    if host is None:
        import socket

        host = socket.gethostname()
    return (
        df.drop("repo", "name", "host")
        .withColumn("repo", F.lit(repo))
        .withColumn("name", F.lit(name))
        .withColumn("host", F.lit(host))
    )


def with_log_date(df: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """Partition column for the sink layout (B1): toDate(created_at),
    mirroring the reference DDL's `PARTITION BY toDate(created_at)`
    (`readme.md:121`)."""
    return df.withColumn("log_date", F.to_date(F.col(ts_col)))
