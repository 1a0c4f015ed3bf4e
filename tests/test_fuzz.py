"""Property-based robustness: arbitrary input text must never crash
the parse chain or the text primitives — the engine's contract is
"valid row or dead-letter", never an exception (the reference worker
likewise survives garbage lines, Worker.php:154-156)."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import functions as F

from log2ck_spark.functions.text import fingerprint, hashed_shingles, shingles, tokens
from log2ck_spark.parse import parse_lines, split_valid

# printable-ish single lines: no newlines (a line source never emits
# them), but everything else goes — unicode, regex metacharacters,
# brackets, empty strings, huge repeats.
line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    max_size=200,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(line, min_size=1, max_size=30))
def test_parse_chain_total_and_crash_free(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    valid, dead = split_valid(parse_lines(df))
    n_valid, n_dead = valid.count(), dead.count()
    assert n_valid + n_dead == len(lines)  # nothing dropped, nothing dup'd
    # every valid row carries a real timestamp (the validity contract)
    assert valid.filter(F.col("created_at").isNull()).count() == 0


@settings(max_examples=5, deadline=None)
@given(st.lists(line, min_size=1, max_size=30))
def test_text_primitives_crash_free(spark, texts):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(texts)],
                               "doc_id long, body string")
    out = df.select(
        "doc_id",
        F.size(shingles("body", w=3)).alias("n_sh"),
        fingerprint("body").alias("fp"),
        tokens("body").alias("toks"),
    ).select(
        "doc_id", "n_sh", "fp", F.size(hashed_shingles("toks", w=5)).alias("n_hsh")
    )
    rows = out.collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r.n_sh >= 0 and r.n_hsh >= 0
        assert r.fp is not None and len(r.fp) == 32  # md5 hex


def test_parser_pathological_lines(spark):
    """Named adversarial cases: regex metachars in fields, almost-valid
    monolog shapes, bracket bombs, enormous lines."""
    cases = [
        "",
        "[",
        "[] .: ",
        "[2024-01-01 10:00:00] app.INFO: ok {} []",  # valid
        "[2024-99-99 10:00:00] app.INFO: bad date {} []",  # regex-valid, date-invalid
        "[2024-01-01 10:00:00] app.INFO: trailing space  {} []",
        "[2024-01-01 10:00:00] a$p^p.INFO: weird logger {} []",
        "[2024-01-01 10:00:00] app.INFO: " + "x" * 100_000 + " {} []",
        "]][[[ not monolog at all (.*) \\1 $1",
    ]
    df = spark.createDataFrame([(x,) for x in cases], "value string")
    valid, dead = split_valid(parse_lines(df))
    vs = {r.message for r in valid.collect()}
    assert "ok" in vs
    assert any(m.startswith("xxxx") for m in vs)  # huge line still parses
    # regex-valid but unparseable datetime goes to dead-letter, not valid
    assert valid.count() + dead.count() == len(cases)
    dead_lines = {r.raw_line for r in dead.collect()}
    assert any("bad date" in d for d in dead_lines)
