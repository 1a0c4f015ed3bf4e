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


@settings(max_examples=5, deadline=None)
@given(st.lists(line, min_size=1, max_size=30))
def test_accesslog_pattern_total_on_garbage(spark, lines):
    """The access-log grammar must also be total: arbitrary line →
    valid row or dead-letter, never an exception (same A5 contract as
    monolog; the pattern is user-swappable, readme.md:81)."""
    from log2ck_spark.queries.ingest import (
        ACCESSLOG_GROUPS,
        ACCESSLOG_PATTERN,
        ACCESSLOG_TS_FORMAT,
    )

    df = spark.createDataFrame([(x,) for x in lines], "value string")
    valid, dead = split_valid(
        parse_lines(
            df,
            pattern=ACCESSLOG_PATTERN,
            groups=ACCESSLOG_GROUPS,
            ts_format=ACCESSLOG_TS_FORMAT,
        )
    )
    assert valid.count() + dead.count() == len(lines)
    assert valid.filter(F.col("created_at").isNull()).count() == 0


def test_accesslog_render_parse_round_trip(spark):
    """Every field of a rendered combined-log line survives the
    parse: ip/user/path strings, int status/bytes, zoned timestamp."""
    from log2ck_spark.queries.ingest import (
        ACCESSLOG_GROUPS,
        ACCESSLOG_PATTERN,
        ACCESSLOG_TS_FORMAT,
    )

    raw = '10.0.0.7 - u42 [05/Mar/2024:16:30:01 +0000] "GET /e/click/99 HTTP/1.1" 200 3110'
    df = spark.createDataFrame([(raw,)], "value string")
    valid, dead = split_valid(
        parse_lines(
            df,
            pattern=ACCESSLOG_PATTERN,
            groups=ACCESSLOG_GROUPS,
            ts_format=ACCESSLOG_TS_FORMAT,
        )
    )
    assert dead.count() == 0
    row = valid.collect()[0]
    assert row.ip == "10.0.0.7" and row.http_user == "u42"
    assert row.path == "/e/click/99"
    assert (row.status, row.bytes) == ("200", "3110")  # typed by the query
    assert row.created_at.strftime("%Y-%m-%d %H:%M:%S") == "2024-03-05 16:30:01"


def test_logfmt_round_trip_arbitrary_keys(spark):
    """str_to_map keeps keys the fixed-group regex path would drop —
    the self-describing-log property the logfmt parser exists for."""
    df = spark.createDataFrame(
        [("a=1 b=two c=3.5 extra_key=kept",)], "value string"
    )
    m = df.select(F.expr("str_to_map(value, ' ', '=')").alias("kv"))
    row = m.collect()[0]
    assert row.kv == {"a": "1", "b": "two", "c": "3.5", "extra_key": "kept"}


# ---------------------------------------------------------------------------
# Fixed-point Lloyd cross-engine contract (embedding_kmeans oracle)
# ---------------------------------------------------------------------------

# Non-negative int64 components, as _quantize_expr guarantees via its
# offset — the property that makes numpy's floor `//` and DuckDB's
# truncating `//` coincide. The strategy stays deliberately small so
# hypothesis explores shapes (duplicate vectors -> distance ties,
# singleton clusters, k == n) rather than magnitudes.
_component = st.integers(min_value=0, max_value=1 << 25)
_vectors = st.integers(min_value=2, max_value=4).flatmap(
    lambda dim: st.lists(
        st.lists(_component, min_size=dim, max_size=dim),
        min_size=1,
        max_size=24,
    )
)


@settings(max_examples=15, deadline=None)
@given(_vectors, st.integers(min_value=1, max_value=5))
def test_fixedpoint_lloyd_matches_duckdb_replay(vecs, k):
    """The trainer and the oracle's unrolled CTE replay must agree
    BIT-FOR-BIT on arbitrary non-negative integer inputs — ties,
    empty clusters, k == n, duplicates included. This is the exact
    cross-engine division/argmin contract the embedding_kmeans value
    check rides on (and the test that would have caught the
    floor-vs-truncate `//` divergence up front)."""
    import duckdb
    import numpy as np

    from log2ck_spark.queries.semantic import (
        _LLOYD_ITERS,
        _fixedpoint_lloyd,
        _lloyd_iteration_sql,
    )

    k = min(k, len(vecs))
    sample = np.array(vecs, dtype=np.int64)
    trained = _fixedpoint_lloyd(sample, k)

    values = ",".join(
        f"({rn + 1}, [{','.join(str(x) for x in v)}]::BIGINT[])"
        for rn, v in enumerate(vecs)
    )
    iters = ",".join(
        _lloyd_iteration_sql(i) for i in range(1, _LLOYD_ITERS + 1)
    )
    rows = duckdb.connect().execute(f"""
        WITH samp(rn, z) AS (VALUES {values}),
        c0 AS (
          SELECT CAST(rn - 1 AS INTEGER) AS cluster_id, z AS c
          FROM samp WHERE rn <= {k}
        ),
        {iters}
        SELECT cluster_id, c FROM c{_LLOYD_ITERS} ORDER BY cluster_id
    """).fetchall()
    replayed = np.array([r[1] for r in rows], dtype=np.int64)
    assert (trained == replayed).all(), (
        f"cross-engine Lloyd divergence:\nnumpy={trained}\nduck={replayed}"
    )


# ------------------------------------------------------------------
# JSONEachRow wire serializer: every value shape the executor can hand
# the ClickHouse HTTP sink must become one VALID JSON line with the
# documented conversions — never a TypeError poisoning the batch,
# never a bare NaN token, never silent byte corruption.
# ------------------------------------------------------------------

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
    st.decimals(allow_nan=False, allow_infinity=False, places=4),
    st.datetimes(timezones=st.none() | st.timezones()),
    st.dates(),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=10), _value, max_size=5))
def test_json_each_row_serializes_arbitrary_rows(row):
    import base64
    import datetime
    import decimal
    import json
    import math

    from log2ck_spark.sink import rows_to_json_each_row

    (line_bytes,) = rows_to_json_each_row([row])
    assert b"\n" not in line_bytes  # one row == one line, framing-safe
    got = json.loads(line_bytes.decode("utf-8"))  # must be valid JSON

    def check(orig, out):
        if isinstance(orig, float) and not math.isfinite(orig):
            assert out is None
        elif isinstance(orig, (bytes, bytearray)):
            assert base64.b64decode(out) == bytes(orig)  # byte-exact
        elif isinstance(orig, decimal.Decimal):
            assert decimal.Decimal(out) == orig  # lossless
        elif isinstance(orig, datetime.datetime):
            # reparsable zero-padded value (fromisoformat accepts the
            # trimmed-fraction form); tz-aware inputs land as the
            # equivalent UTC-naive instant
            want = orig
            if want.tzinfo is not None:
                try:
                    want = want.astimezone(datetime.timezone.utc).replace(
                        tzinfo=None
                    )
                except (OverflowError, OSError):
                    # mirror the serializer's epoch-bound fallback
                    want = want.replace(tzinfo=None)
            assert out.startswith(want.date().isoformat())
            # pre-3.11 fromisoformat only accepts 3- or 6-digit
            # fractions; pad the trimmed fraction before parsing
            iso = out
            if "." in iso:
                head, frac = iso.rsplit(".", 1)
                iso = head + "." + frac.ljust(6, "0")
            assert datetime.datetime.fromisoformat(iso) == want
        elif isinstance(orig, datetime.date):
            assert out == orig.isoformat()
        elif isinstance(orig, list):
            assert isinstance(out, list) and len(out) == len(orig)
            for o, u in zip(orig, out):
                check(o, u)
        elif isinstance(orig, dict):
            assert set(out) == set(orig)
            for k in orig:
                check(orig[k], out[k])
        else:
            assert out == orig

    check(row, got)


def test_json_each_row_map_keys_of_every_legal_type():
    """Spark MapType keys may be any non-map type — date, timestamp,
    decimal, binary, int — and json.dumps rejects non-primitive keys
    with TypeError, poisoning the batch. Keys must render through the
    same conversions as values, as strings."""
    import datetime
    import decimal
    import json

    from log2ck_spark.sink import rows_to_json_each_row

    rows = [
        {
            "by_date": {datetime.date(2024, 1, 2): 1},
            "by_ts": {datetime.datetime(2024, 1, 2, 3, 4, 5): 2},
            "by_dec": {decimal.Decimal("1.50"): 3},
            "by_bin": {b"\x00\xff": 4},
            "by_int": {7: 5},
            "by_nan": {float("nan"): 6},
        }
    ]
    (line,) = rows_to_json_each_row(rows)
    got = json.loads(line.decode("utf-8"))
    assert got["by_date"] == {"2024-01-02": 1}
    assert got["by_ts"] == {"2024-01-02 03:04:05": 2}
    assert got["by_dec"] == {"1.50": 3}
    assert got["by_bin"] == {"AP8=": 4}  # base64 of 00 ff
    assert got["by_int"] == {"7": 5}  # json's own int-key coercion
    assert got["by_nan"] == {"null": 6}  # non-finite -> null, as text


# --------------------------------------------------------------------------
# hll_group_stats kernel properties (r8 single-scan sentinel rewrite)
# --------------------------------------------------------------------------

_hll_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(st.none(), st.integers(min_value=0, max_value=40)),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(_hll_rows)
def test_hll_group_stats_properties(spark, rows):
    """The single-scan kernel's contract over arbitrary group/value
    mixes (NULLs included): every group present, n = the group's TOTAL
    row count (NULLs counted), est = 0 exactly when the group has no
    non-NULL values, else within the m=512 error envelope of the true
    distinct count (3 sigma of 1.04/sqrt(512), absolute floor 2 for
    tiny groups where one register collision is a unit of relative
    error)."""
    import collections

    from log2ck_spark.queries.sketches import hll_group_stats

    df = spark.createDataFrame(rows, "g string, v int")
    out = {
        r["g"]: r for r in hll_group_stats(df, "g", "v").collect()
    }
    n_rows = collections.Counter(g for g, _ in rows)
    distinct = {
        g: len({v for gg, v in rows if gg == g and v is not None})
        for g in n_rows
    }
    assert set(out) == set(n_rows)
    for g in n_rows:
        assert out[g]["n"] == n_rows[g]
        d = distinct[g]
        if d == 0:
            assert out[g]["est"] == 0.0
        else:
            assert abs(out[g]["est"] - d) <= max(2.0, 3 * 0.046 * d)
