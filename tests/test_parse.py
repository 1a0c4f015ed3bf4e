"""Part A semantics unit tests — the FIXTURES.md §4 monolog corpus
edge cases, exercised through the real pipeline chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
from log2ck_spark.parse import parse_lines, split_valid, enrich
from log2ck_spark.pipeline import batch_pipeline, expand_date_macro, transform_chain

VALID = [
    '[2024-01-01 10:00:00] app.INFO: user logged in {"user":7,"ms":12} []',
    '[2024-01-01 10:00:01] app.ERROR: boom {"user":8} []',
    '[2024-01-02 00:00:00] worker.WARNING: slow job {"ms":9001} {"x":1}',
]
INVALID = [
    "",  # empty line → skipped (Worker.php:112)
    "not a log line at all",  # no match → dead-letter (Worker.php:154-156)
    '[2024-01-01 10:00:00] my logger.INFO: spaces in logger {} []',  # readme.md:20
    '[not-a-date] app.INFO: bad ts {} []',  # regex ok, timestamp unparseable
]


def _lines_df(spark, lines):
    return spark.createDataFrame([(line,) for line in lines], "value string")


def test_valid_lines_parse_all_groups(spark):
    valid, dead = split_valid(parse_lines(_lines_df(spark, VALID)))
    rows = {r["message"]: r for r in valid.collect()}
    assert len(rows) == 3 and dead.count() == 0
    r = rows["user logged in"]
    assert r["logger"] == "app"
    assert r["level"] == "INFO"
    assert r["context"] == '{"user":7,"ms":12}'
    assert r["extra"] == "[]"
    assert r["created_at"].isoformat() == "2024-01-01T10:00:00"


def test_invalid_lines_go_to_dead_letter(spark):
    valid, dead = split_valid(parse_lines(_lines_df(spark, VALID + INVALID)))
    assert valid.count() == 3
    # empty line is also invalid input (reference skips it pre-parse;
    # we route it to dead-letter — same rows land in the sink)
    assert dead.count() == 4
    dead_raws = {r["raw_line"] for r in dead.collect()}
    assert "not a log line at all" in dead_raws
    assert "[not-a-date] app.INFO: bad ts {} []" in dead_raws


def test_sep_byte_lines_dead_letter_not_missplit(spark):
    """The single-pass extract's documented contract edge: a line
    containing the \x01 field separator dead-letters (recoverable)
    rather than silently mis-splitting its own fields — even when it
    otherwise matches the grammar."""
    hostile = '[2024-01-01 10:00:00] app.INFO: msg with \x01 byte {} []'
    valid, dead = split_valid(parse_lines(_lines_df(spark, [hostile])))
    assert valid.count() == 0
    assert dead.collect()[0]["raw_line"] == hostile


def test_enrich_overwrites_callback_columns(spark):
    """Reference order: enrichment AFTER callback, overwriting it
    (Worker.php:146-148)."""
    valid, _ = split_valid(parse_lines(_lines_df(spark, VALID)))
    with_fake = valid.withColumn("repo", F.lit("from-callback"))
    out = enrich(with_fake, repo="real-repo", name="tail-1", host="h")
    assert {r["repo"] for r in out.collect()} == {"real-repo"}
    # default host = gethostname() (Worker.php:148), not "localhost"
    import socket

    out2 = enrich(valid, repo="r", name="n")
    assert {r["host"] for r in out2.collect()} == {socket.gethostname()}


def test_pattern_false_raw_passthrough(spark):
    tail = TailSpec(
        name="raw", path="x", pattern=False,
        callback=lambda df: df.select(F.upper("raw").alias("shout")),
    )
    rows, dead = transform_chain(_lines_df(spark, ["hello world"]), tail)
    got = rows.collect()
    assert dead.count() == 0
    assert got[0]["shout"] == "HELLO WORLD"
    assert got[0]["repo"] == "default"  # enrichment still applied


def test_custom_pattern_groups(spark):
    tail = TailSpec(
        name="csvish", path="x",
        pattern=r"^(\w+),(\d+)$", groups=("word", "num"),
    )
    rows, dead = transform_chain(
        _lines_df(spark, ["abc,42", "bad line"]), tail
    )
    assert [r["word"] for r in rows.collect()] == ["abc"]
    assert dead.count() == 1


def test_rotation_glob_reads_both_days(spark, tmp_path):
    """Two rotated daily files ingested via glob — subsumes the
    reference's kill-and-respawn rollover (Manager.php:72-89)."""
    for day, n in [("2024-01-01", 3), ("2024-01-02", 2)]:
        lines = "\n".join(
            f"[{day} 0{i}:00:00] app.INFO: m{i} {{}} []" for i in range(n)
        )
        (tmp_path / f"app-{day}.log").write_text(lines + "\n")
    config = EngineConfig(
        tails=[TailSpec(name="t", path=str(tmp_path / "app-*.log"))],
        sink=SinkConfig(path=str(tmp_path / "out")),
    )
    rows, dead = batch_pipeline(spark, config, config.tails[0])
    assert rows.count() == 5
    assert rows.select("log_date").distinct().count() == 2
    assert dead.count() == 0


def test_date_macro():
    from datetime import date

    assert (
        expand_date_macro("/logs/app-{date}.log", date(2024, 3, 9))
        == "/logs/app-2024-03-09.log"
    )


def test_config_validation():
    with pytest.raises(ValueError):
        EngineConfig(tails=[]).validate()
    with pytest.raises(ValueError):
        EngineConfig(tails=[TailSpec(name="", path="p")]).validate()
    with pytest.raises(ValueError):
        EngineConfig(
            tails=[TailSpec(name="t", path="p", pandas_callback=lambda it: it)]
        ).validate()
    ok = EngineConfig(tails=[TailSpec(name="t", path="p")])
    assert ok.validate() is ok
    override = SinkConfig(path="/other")
    t2 = TailSpec(name="u", path="q", sink=override)
    assert ok.sink_for(t2) is override  # A11 per-tail override
    assert ok.sink_for(ok.tails[0]) is ok.sink


def test_unanchored_pattern_extracts_exact_groups(spark):
    """An UNANCHORED custom pattern must extract exact group contents
    (the reference's preg_match semantics). The bare regexp_replace
    rewrite edited matches in place, fusing the surrounding text into
    the edge groups ('x a=1 b=2 y' -> a='x 1', b='2 y') and fusing
    fields ACROSS matches on a twice-matching line — silent corruption
    with _valid still true."""
    from log2ck_spark.parse import parse_lines, split_valid

    df = spark.createDataFrame(
        [("x a=1 b=2 y",), ("a=7 b=8 junk a=9 b=0",), ("no match here",)],
        "value string",
    )
    parsed = parse_lines(
        df,
        pattern=r"a=(\d+) b=(\d+)",
        groups=("a", "b"),
        ts_group=None,
    )
    valid, dead = split_valid(parsed)
    got = {(r["a"], r["b"]) for r in valid.collect()}
    # exact group contents; the double-match line keeps its FIRST match
    assert got == {("1", "2"), ("7", "8")}
    assert [r["raw_line"] for r in dead.collect()] == ["no match here"]


def test_custom_ts_format_flows_through_tailspec(spark):
    """A config-driven tail with a non-monolog timestamp grammar must
    be able to declare ts_format (accesslog's 'dd/MMM/yyyy:HH:mm:ss Z'
    parsed with the monolog format NULLs every created_at -> 100%
    dead-letter)."""
    from log2ck_spark.config import TailSpec
    from log2ck_spark.pipeline import transform_chain
    from log2ck_spark.queries.ingest import (
        ACCESSLOG_GROUPS,
        ACCESSLOG_PATTERN,
        ACCESSLOG_TS_FORMAT,
    )

    line = '10.0.0.1 - u7 [15/Aug/2026:10:30:00 +0000] "GET /e/click/3 HTTP/1.1" 200 17'
    df = spark.createDataFrame([(line,)], "value string")
    tail = TailSpec(
        name="acc",
        path="unused",
        pattern=ACCESSLOG_PATTERN,
        groups=ACCESSLOG_GROUPS,
        ts_format=ACCESSLOG_TS_FORMAT,
    )
    rows, dead = transform_chain(df, tail)
    assert dead.count() == 0
    (r,) = rows.collect()
    assert r["created_at"] is not None and r["path"] == "/e/click/3"

    # monolog default format on the same line: all dead-lettered
    bad = TailSpec(
        name="acc2",
        path="unused",
        pattern=ACCESSLOG_PATTERN,
        groups=ACCESSLOG_GROUPS,
    )
    rows2, dead2 = transform_chain(df, bad)
    assert rows2.count() == 0 and dead2.count() == 1


def test_validate_rejects_group_count_mismatch():
    """A pattern with fewer capture groups than declared group names
    aborts the Spark job at the FIRST matching line (regexp_replace
    'No group N') — hours into a backfill. validate() must catch it at
    config load, and a non-string/non-False pattern likewise."""
    import pytest

    from log2ck_spark.config import EngineConfig, TailSpec

    bad = EngineConfig(
        tails=[
            TailSpec(
                name="t",
                path="p",
                pattern=r"^a=(\d+) b=(\d+)$",
                groups=("a", "b", "c"),
            )
        ]
    )
    with pytest.raises(ValueError, match="capture group"):
        bad.validate()

    with pytest.raises(ValueError, match="pattern must be"):
        EngineConfig(
            tails=[TailSpec(name="t", path="p", pattern=True)]
        ).validate()


def test_validate_rejects_python_only_regex_syntax():
    """Validation compiles with Python's re but the extract runs under
    Java's regex: (?P<name>…) compiles fine in Python and aborts the
    whole Spark job at runtime. Catch the known Python-only spellings
    at config time, with the Java equivalent in the message."""
    import pytest

    from log2ck_spark.config import EngineConfig, TailSpec

    for pat in (
        r"^(?P<level>\w+) (\S+)$",  # named group, Python spelling
        r"^(\w+) (?P=1)$",          # named backreference
        r"^(a)?(?(1)b|c)$",         # conditional group
    ):
        cfg = EngineConfig(
            tails=[
                TailSpec(name="t", path="p", pattern=pat, groups=("x", "y"))
            ]
        )
        with pytest.raises(ValueError, match="Python-only"):
            cfg.validate()

    # the Java spelling of a named group must PASS
    EngineConfig(
        tails=[
            TailSpec(
                name="t",
                path="p",
                pattern=r"^(?<level>\w+) (\S+)$",
                groups=("level", "rest"),
            )
        ]
    ).validate()

    # ESCAPED-paren literals that merely CONTAIN the "(?P" substring
    # are valid in both engines and must pass (r10 ADVICE fix: the
    # raw substring test falsely rejected these), while an escaped
    # BACKSLASH before the group ("\\\\(?P" = literal backslash, real
    # Python-only group) must still be caught.
    EngineConfig(
        tails=[
            TailSpec(
                name="t",
                path="p",
                pattern=r"^x\(?P(\w+) (\S+)$",  # literal "(", optional — fine
                groups=("a", "b"),
            )
        ]
    ).validate()
    with pytest.raises(ValueError, match="Python-only"):
        EngineConfig(
            tails=[
                TailSpec(
                    name="t",
                    path="p",
                    pattern="^x\\\\(?P<a>\\w+) (\\S+)$",
                    groups=("a", "b"),
                )
            ]
        ).validate()


def test_stream_date_glob_rolls_at_midnight():
    """{date} in a STREAMING path must become a date-family glob:
    resolving it to today's literal at query construction freezes the
    stream onto one day's file and ingestion silently stops at
    midnight."""
    from log2ck_spark.pipeline import stream_date_glob

    g = stream_date_glob("/logs/app-{date}.log")
    assert g == "/logs/app-[0-9][0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9].log"
    import fnmatch

    assert fnmatch.fnmatch("/logs/app-2026-08-15.log", g)
    assert fnmatch.fnmatch("/logs/app-2026-08-16.log", g)  # next day too
    assert not fnmatch.fnmatch("/logs/app-today.log", g)
