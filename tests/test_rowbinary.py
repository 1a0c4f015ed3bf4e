"""ClickHouse RowBinary encoder (log2ck_spark/formats.py) — golden
byte vectors against the published format spec, config-time
validation, and the executor-side HTTP wire path end-to-end.

The expected bytes below are spelled with struct.pack directly in the
assertions — an independent rendering of the same public spec, so an
encoder bug can't hide behind its own helper."""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from log2ck_spark.formats import (
    _varint,
    ck_columns_for_schema,
    codec_for,
    rows_to_row_binary,
)


def _enc(ck_type: str, value) -> bytes:
    out = bytearray()
    codec_for(ck_type).encode(value, out)
    return bytes(out)


# --------------------------------------------------------------------------
# Golden vectors
# --------------------------------------------------------------------------


def test_varint_leb128():
    assert _varint(0) == b"\x00"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(300) == b"\xac\x02"


def test_fixed_width_integers():
    assert _enc("UInt8", 5) == b"\x05"
    assert _enc("Int8", -1) == b"\xff"
    assert _enc("UInt16", 258) == struct.pack("<H", 258)
    assert _enc("Int32", -7) == struct.pack("<i", -7)
    assert _enc("Int64", -2) == struct.pack("<q", -2)
    assert _enc("UInt64", 2**63) == struct.pack("<Q", 2**63)


def test_integer_out_of_range_raises():
    with pytest.raises(ValueError, match="out of range"):
        _enc("UInt8", 256)
    with pytest.raises(ValueError, match="out of range"):
        _enc("Int32", 2**31)


def test_floats_including_nonfinite():
    assert _enc("Float64", 1.5) == struct.pack("<d", 1.5)
    assert _enc("Float32", 1.5) == struct.pack("<f", 1.5)
    # RowBinary carries non-finite floats NATIVELY — the JSONEachRow
    # path must degrade them to null; this is a fidelity upgrade
    assert _enc("Float64", float("nan")) == struct.pack("<d", float("nan"))
    assert _enc("Float64", float("inf")) == struct.pack("<d", float("inf"))


def test_string_text_and_raw_bytes():
    assert _enc("String", "abc") == b"\x03abc"
    assert _enc("String", "héllo") == (
        _varint(len("héllo".encode())) + "héllo".encode()
    )
    # bytes pass through untouched — no base64, unlike JSONEachRow
    assert _enc("String", b"\x00\xff\x80") == b"\x03\x00\xff\x80"
    long = "x" * 300
    assert _enc("String", long) == b"\xac\x02" + long.encode()


def test_bool_and_nullable():
    assert _enc("Bool", True) == b"\x01"
    assert _enc("Bool", False) == b"\x00"
    assert _enc("Nullable(Int32)", None) == b"\x01"
    assert _enc("Nullable(Int32)", 7) == b"\x00" + struct.pack("<i", 7)
    assert _enc("Nullable(String)", "a") == b"\x00\x01a"


def test_null_in_non_nullable_raises():
    with pytest.raises(ValueError, match="non-Nullable"):
        _enc("Int64", None)
    with pytest.raises(ValueError, match="non-Nullable"):
        _enc("String", None)


def test_dates():
    assert _enc("Date", dt.date(1970, 1, 2)) == struct.pack("<H", 1)
    assert _enc("Date", dt.date(2024, 2, 29)) == struct.pack(
        "<H", (dt.date(2024, 2, 29) - dt.date(1970, 1, 1)).days
    )
    # Date32 is SIGNED — pre-1970 representable
    assert _enc("Date32", dt.date(1969, 12, 31)) == struct.pack("<i", -1)
    # Date (UInt16) is not: 1969 and >2149 both raise loudly
    with pytest.raises(ValueError, match="Date"):
        _enc("Date", dt.date(1969, 12, 31))
    with pytest.raises(ValueError, match="Date"):
        _enc("Date", dt.date(2200, 1, 1))
    # a datetime value in a Date column truncates to its date
    assert _enc("Date", dt.datetime(1970, 1, 3, 23, 59)) == struct.pack(
        "<H", 2
    )


def test_datetimes_exact_integer_ticks():
    assert _enc("DateTime", dt.datetime(1970, 1, 1, 0, 1, 40)) == struct.pack(
        "<I", 100
    )
    # DateTime64(6): microsecond ticks, exact integer arithmetic
    v = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    epoch_us = int(
        v.replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 10**6 + v.microsecond
    assert _enc("DateTime64(6)", v) == struct.pack("<q", epoch_us)
    # millisecond precision floors the microseconds
    assert _enc("DateTime64(3)", v) == struct.pack("<q", epoch_us // 1000)
    # nanosecond precision zero-pads
    assert _enc("DateTime64(9)", v) == struct.pack("<q", epoch_us * 1000)
    # pre-1970 instants: DateTime (UInt32) raises with guidance,
    # DateTime64 (Int64) encodes the negative tick count
    pre = dt.datetime(1969, 12, 31, 23, 59, 59)
    with pytest.raises(ValueError, match="DateTime64"):
        _enc("DateTime", pre)
    assert _enc("DateTime64(6)", pre) == struct.pack("<q", -1_000_000)
    # tz-aware input normalizes to its UTC instant
    aware = dt.datetime(
        1970, 1, 1, 1, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=1))
    )
    assert _enc("DateTime", aware) == struct.pack("<I", 0)
    # plain DateTime TRUNCATES sub-second parts (documented contract —
    # what CK does with a fractional text timestamp in a DateTime
    # column), never rounds up and never errors
    frac = dt.datetime(1970, 1, 1, 0, 1, 40, 999_999)
    assert _enc("DateTime", frac) == struct.pack("<I", 100)
    # an Int64-overflowing tick count raises the documented ValueError,
    # not a bare struct.error (ADVICE r10)
    far = dt.datetime(9999, 12, 31, 23, 59, 59)
    with pytest.raises(ValueError, match=r"DateTime64\(9\).*tick"):
        _enc("DateTime64(9)", far)


def test_decimal_width_follows_precision_tier():
    # Decimal64 tier (P 10..18): Int64 storage
    assert _enc("Decimal(10,2)", "12.34") == struct.pack("<q", 1234)
    assert _enc("Decimal(18,6)", 1.5) == struct.pack("<q", 1_500_000)
    # Decimal32 tier (P 1..9): Int32 storage — 4 bytes, not 8; the
    # wrong width would misalign every later column in the row stream
    assert _enc("Decimal(9,2)", "12.34") == struct.pack("<i", 1234)
    assert _enc("Decimal(4,0)", 7) == struct.pack("<i", 7)
    # Decimal128 (P 19..38): Int128 LE — 16 bytes (r11)
    import decimal as _d

    assert _enc("Decimal(38,6)", "1.5") == (1_500_000).to_bytes(
        16, "little", signed=True
    )
    assert _enc("Decimal(38,6)", _d.Decimal("-2")) == (
        -2_000_000
    ).to_bytes(16, "little", signed=True)
    # a 25-significant-digit value: exceeds the default decimal
    # context's 28 digits once scaled — must stay EXACT, not round
    wide = "1234567890123456789.123456"
    assert _enc("Decimal(38,6)", wide) == int(
        wide.replace(".", "")
    ).to_bytes(16, "little", signed=True)
    # Decimal256 (P 39..76): Int256 LE — 32 bytes
    assert _enc("Decimal(76,0)", 10**75 - 1) == (10**75 - 1).to_bytes(
        32, "little", signed=True
    )
    with pytest.raises(ValueError, match="1..76"):
        codec_for("Decimal(77,6)")


def test_wide_integers_little_endian():
    assert _enc("Int128", -1) == b"\xff" * 16
    assert _enc("UInt128", 2**127) == (2**127).to_bytes(16, "little")
    assert _enc("Int256", 5) == (5).to_bytes(32, "little", signed=True)
    assert _enc("UInt256", 2**255) == (2**255).to_bytes(32, "little")
    with pytest.raises(ValueError, match="out of range"):
        _enc("UInt128", -1)
    with pytest.raises(ValueError, match="out of range"):
        _enc("Int128", 2**127)


def test_wide_integers_reject_floats_and_strings():
    """Fail-loud parity with the narrow codecs (r12, ADVICE): int(v)
    would silently truncate 3.9 -> 3 and coerce "7" -> 7; the wide
    widths must raise exactly like struct.pack does for Int64."""
    for t in ("Int128", "UInt128", "Int256", "UInt256"):
        with pytest.raises(ValueError, match="out of range"):
            _enc(t, 3.9)
        with pytest.raises(ValueError, match="out of range"):
            _enc(t, 3.0)  # even integral floats: a typed-column bug
        with pytest.raises(ValueError, match="out of range"):
            _enc(t, "7")
    # bool is an int subtype and a legitimate integral value
    assert _enc("UInt128", True) == (1).to_bytes(16, "little")
    # narrow codecs behave identically (the contract being mirrored)
    with pytest.raises(ValueError):
        _enc("Int64", 3.9)


def test_split_top_tracks_backtick_quoted_identifiers():
    """A named Tuple field whose backticked name contains a top-level
    comma or paren (DESCRIBE emits these for hostile column names)
    must not be split mid-name (r12, ADVICE)."""
    c = codec_for("Tuple(`a,b` Int64, c String)")
    out = bytearray()
    c.encode((7, "x"), out)
    assert bytes(out) == (7).to_bytes(8, "little", signed=True) + b"\x01x"
    c2 = codec_for("Tuple(`we(ird)` UInt8, `q,` String)")
    out2 = bytearray()
    c2.encode((3, "y"), out2)
    assert bytes(out2) == b"\x03\x01y"


def test_decimal_enforces_declared_precision_and_rejects_nan():
    # 13 significant digits exceed Decimal(12,2) even though the
    # scaled integer fits Int64 — CK does not re-validate binary
    # input, so this must raise here, not land as corrupt data
    with pytest.raises(ValueError, match="exceeds Decimal"):
        _enc("Decimal(12,2)", "99999999999.99")
    with pytest.raises(ValueError, match="not encodable"):
        _enc("Decimal(10,2)", float("nan"))
    with pytest.raises(ValueError, match="not encodable"):
        _enc("Decimal(10,2)", "oops")


def test_datetime64_precision_capped_at_config_time():
    with pytest.raises(ValueError, match="precision is 0..9"):
        codec_for("DateTime64(12)")


def test_arrays_including_nested_nullable():
    assert _enc("Array(UInt8)", [1, 2, 3]) == b"\x03\x01\x02\x03"
    assert _enc("Array(String)", ["a", "bc"]) == b"\x02\x01a\x02bc"
    assert _enc("Array(Nullable(UInt8))", [1, None]) == (
        b"\x02\x00\x01\x01"
    )
    assert _enc("Array(UInt8)", []) == b"\x00"


def test_unsupported_type_raises_at_parse_time():
    # Map/Enum/Int128 gained codecs in r11; these remain genuinely
    # unsupported and must fail at writer creation, not mid-batch
    with pytest.raises(ValueError, match="unsupported"):
        codec_for("AggregateFunction(sum, Int64)")
    with pytest.raises(ValueError, match="unsupported"):
        codec_for("Int512")
    with pytest.raises(ValueError, match="unsupported"):
        codec_for("JSON")
    with pytest.raises(ValueError, match="two type arguments"):
        codec_for("Map(String)")


# --------------------------------------------------------------------------
# Row-level encoding and schema inference
# --------------------------------------------------------------------------


def test_rows_to_row_binary_row_layout_and_order():
    cols = [("k", "UInt8"), ("s", "String"), ("v", "Nullable(Float64)")]
    rows = [
        {"k": 1, "s": "a", "v": 1.5},
        {"k": 2, "s": "b", "v": None},
    ]
    got = list(rows_to_row_binary(rows, cols))
    assert got[0] == b"\x01" + b"\x01a" + b"\x00" + struct.pack("<d", 1.5)
    assert got[1] == b"\x02" + b"\x01b" + b"\x01"
    # dicts are addressed BY NAME (declared column order wins over
    # dict insertion order)
    shuffled = [{"v": 1.5, "s": "a", "k": 1}]
    assert next(iter(rows_to_row_binary(shuffled, cols))) == got[0]
    # a declared name MISSING from the row raises — under a Nullable
    # column a silent default would insert NULL for every row of a
    # typo'd column (silent data loss)
    with pytest.raises(ValueError, match="missing"):
        list(rows_to_row_binary([{"k": 1, "s": "a"}], cols))


def test_ck_columns_for_schema_inference(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, dt.datetime(2024, 1, 1), dt.date(2024, 1, 1), [0.5])],
        "id long, msg string, v double, ts timestamp, d date,"
        " emb array<double>",
    )
    cols = dict(ck_columns_for_schema(df.schema))
    assert cols["id"] == "Nullable(Int64)"
    assert cols["msg"] == "Nullable(String)"
    assert cols["v"] == "Nullable(Float64)"
    assert cols["ts"] == "Nullable(DateTime64(6))"
    assert cols["d"] == "Nullable(Date32)"
    assert cols["emb"] == "Nullable(Array(Nullable(Float64)))"


# --------------------------------------------------------------------------
# Writer config validation and the live wire path
# --------------------------------------------------------------------------


def test_row_binary_writer_validates_config_at_creation():
    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for

    with pytest.raises(ValueError, match="unknown format"):
        writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={"url": "http://x", "table": "t", "format": "csv"},
            )
        )
    with pytest.raises(ValueError, match="only applies"):
        writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": "http://x",
                    "table": "t",
                    "columns": ["a Int64"],
                },
            )
        )
    with pytest.raises(ValueError, match="unsupported"):
        writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": "http://x",
                    "table": "t",
                    "format": "row_binary",
                    "columns": ["a AggregateFunction(sum, Int64)"],
                },
            )
        )
    with pytest.raises(ValueError, match="malformed column"):
        writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": "http://x",
                    "table": "t",
                    "format": "row_binary",
                    "columns": ["justaname"],
                },
            )
        )


def test_row_binary_http_sink_end_to_end(spark):
    """writer_for(format='row_binary') with EXPLICIT columns drives a
    batch through executor-side POSTs: the query names the columns and
    FORMAT RowBinary, and the concatenated body decodes back to the
    exact rows under the declared layout."""
    from urllib.parse import parse_qs, urlparse

    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    srv = _RecordingCKServer()
    try:
        df = spark.createDataFrame(
            [
                (1, "a", 1.5, dt.datetime(2024, 1, 1, 10, 0, 0)),
                (2, "b", None, dt.datetime(2024, 1, 2, 11, 30, 5)),
                (3, "c", 2.5, dt.datetime(2024, 1, 3, 23, 59, 59)),
            ],
            "event_id long, msg string, v double, created_at timestamp",
        ).coalesce(1)
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "logs",
                    "format": "row_binary",
                    "columns": [
                        "event_id Int64",
                        "msg String",
                        "v Nullable(Float64)",
                        "created_at DateTime64(6)",
                    ],
                },
            )
        )
        writer(df, 0)
        assert len(srv.requests) == 1
        path, body = srv.requests[0]
        q = parse_qs(urlparse(path).query)["query"][0]
        assert q == (
            "INSERT INTO logs (`event_id`, `msg`, `v`, `created_at`)"
            " FORMAT RowBinary"
        )
        # decode the body with an independent mini-reader
        off = 0

        def take(n):
            nonlocal off
            chunk = body[off:off + n]
            off += n
            return chunk

        decoded = []
        while off < len(body):
            eid = struct.unpack("<q", take(8))[0]
            slen = body[off]
            off += 1  # all test strings are < 128 bytes: 1-byte varint
            msg = take(slen).decode()
            if body[off] == 1:
                off += 1
                v = None
            else:
                off += 1
                v = struct.unpack("<d", take(8))[0]
            ticks = struct.unpack("<q", take(8))[0]
            ts = dt.datetime(1970, 1, 1) + dt.timedelta(
                microseconds=ticks
            )
            decoded.append((eid, msg, v, ts))
        assert sorted(decoded) == [
            (1, "a", 1.5, dt.datetime(2024, 1, 1, 10, 0, 0)),
            (2, "b", None, dt.datetime(2024, 1, 2, 11, 30, 5)),
            (3, "c", 2.5, dt.datetime(2024, 1, 3, 23, 59, 59)),
        ]
    finally:
        srv.close()


def test_row_binary_inferred_schema_end_to_end(spark):
    """columns='infer' (the EXPLICIT opt-in — no longer a silent
    default) infers Nullable(...) column types from the Spark schema
    per batch — every value then carries the one-byte null flag. Only
    correct against a table created from ck_columns_for_schema
    output; the default path now asks the server (DESCRIBE) instead."""
    from urllib.parse import parse_qs, urlparse

    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    srv = _RecordingCKServer()
    try:
        df = spark.createDataFrame(
            [(7, "x"), (8, None)], "k long, s string"
        ).coalesce(1)
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "t",
                    "format": "row_binary",
                    "columns": "infer",
                },
            )
        )
        writer(df, 0)
        path, body = srv.requests[0]
        q = parse_qs(urlparse(path).query)["query"][0]
        assert q == "INSERT INTO t (`k`, `s`) FORMAT RowBinary"
        expect = (
            b"\x00" + struct.pack("<q", 7) + b"\x00\x01x"
            + b"\x00" + struct.pack("<q", 8) + b"\x01"
        )
        assert body == expect
        # no columns declared and inference opted-in: the writer must
        # NOT have issued a DESCRIBE round-trip
        assert srv.gets == []
    finally:
        srv.close()


def test_row_binary_describe_layout_end_to_end(spark):
    """The ZERO-CONFIG default: no 'columns' option → the writer asks
    the server (DESCRIBE TABLE) at creation and encodes each batch
    under the table's ACTUAL types. The fixture table is the hostile
    case that broke schema inference: all non-Nullable columns
    (LowCardinality(String)/DateTime — the reference DDL's shape), a
    MATERIALIZED column that must be excluded, and a server order that
    differs from the DataFrame's. The body must carry NO null-flag
    bytes and decode exactly under the server layout."""
    from urllib.parse import parse_qs, urlparse

    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    describe = (
        "created_at\tDateTime\t\t\t\t\t\n"
        "level\tLowCardinality(String)\t\t\t\t\t\n"
        "message\tString\t\t\t\t\t\n"
        "log_date\tDate\tMATERIALIZED\ttoDate(created_at)\t\t\t\n"
    )
    srv = _RecordingCKServer(describe_tsv=describe)
    try:
        df = spark.createDataFrame(
            [
                ("boom", "ERROR", dt.datetime(2024, 1, 1, 10, 0, 0)),
                ("hello", "INFO", dt.datetime(2024, 1, 1, 10, 0, 1)),
            ],
            "message string, level string, created_at timestamp",
        ).coalesce(1)
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "logs",
                    "format": "row_binary",
                },
            )
        )
        # exactly one DESCRIBE, at writer creation
        assert len(srv.gets) == 1 and "DESCRIBE+TABLE+logs" in srv.gets[0]
        writer(df, 0)
        assert len(srv.gets) == 1  # layout cached, not re-fetched
        path, body = srv.requests[0]
        q = parse_qs(urlparse(path).query)["query"][0]
        # DataFrame column order, SERVER types, materialized excluded
        assert q == (
            "INSERT INTO logs (`message`, `level`, `created_at`)"
            " FORMAT RowBinary"
        )
        rows = []
        off = 0
        for _ in range(2):
            mlen = body[off]; off += 1
            msg = body[off:off + mlen].decode(); off += mlen
            llen = body[off]; off += 1
            lvl = body[off:off + llen].decode(); off += llen
            secs = struct.unpack("<I", body[off:off + 4])[0]; off += 4
            rows.append((msg, lvl, secs))
        assert off == len(body)  # no stray null-flag bytes
        epoch = dt.datetime(1970, 1, 1)
        assert rows == [
            ("boom", "ERROR",
             int((dt.datetime(2024, 1, 1, 10, 0, 0) - epoch)
                 .total_seconds())),
            ("hello", "INFO",
             int((dt.datetime(2024, 1, 1, 10, 0, 1) - epoch)
                 .total_seconds())),
        ]
    finally:
        srv.close()


def test_row_binary_describe_rejects_unknown_batch_column(spark):
    """A batch column absent from the table fails LOUDLY (under a
    Nullable default it would silently insert NULL everywhere for a
    typo'd name — the exact failure mode the DESCRIBE path exists to
    kill)."""
    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    srv = _RecordingCKServer(describe_tsv="k\tInt64\t\t\t\t\t\n")
    try:
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "t",
                    "format": "row_binary",
                },
            )
        )
        df = spark.createDataFrame([(1, "x")], "k long, typo string")
        with pytest.raises(Exception, match="typo"):
            writer(df, 0)
        assert srv.requests == []  # nothing hit the insert path
    finally:
        srv.close()


def test_tail_to_clickhouse_rowbinary_stream_end_to_end(spark, tmp_path):
    """The reference's full dataflow with the BINARY wire format: tail
    a monolog file, regex-parse, micro-batch, ship FORMAT RowBinary
    batches over HTTP. Inferred (all-Nullable) layout; the mini-reader
    walks the null flags + LEB128 strings to recover the parsed rows."""
    from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
    from log2ck_spark.streaming import run_ingest_stream, stop_all
    from tests.test_clickhouse_sink import _RecordingCKServer
    from urllib.parse import parse_qs, urlparse

    srv = _RecordingCKServer()
    try:
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "app.log").write_text(
            "[2024-01-01 10:00:00] app.INFO: hello {} []\n"
            "[2024-01-01 10:00:01] app.ERROR: boom {} []\n"
        )
        config = EngineConfig(
            tails=[TailSpec(name="ckbin", path=str(logs / "*.log"))],
            sink=SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "logs",
                    "format": "row_binary",
                    "columns": "infer",
                },
            ),
            checkpoint_root=str(tmp_path / "ckpt"),
            trigger_seconds=1,
        )
        run_ingest_stream(spark, config, config.tails[0])

        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline and not srv.requests:
            _t.sleep(0.5)
        assert srv.requests, "no insert arrived"
        body = b"".join(b for _p, b in srv.requests)
        q = parse_qs(urlparse(srv.requests[0][0]).query)["query"][0]
        assert q.startswith("INSERT INTO logs (") and q.endswith(
            "FORMAT RowBinary"
        )
        # every parsed column is a Nullable(String)/Nullable(...) under
        # schema inference; rather than fully decode a wide row here,
        # assert the distinguishing payloads arrived as LEB128-framed
        # UTF-8 (each short string is length-prefixed by its own byte)
        for token in (b"\x05hello", b"\x04boom", b"\x04INFO", b"\x05ERROR"):
            assert token in body, (token, body)
    finally:
        stop_all(spark)
        srv.close()


def test_lowcardinality_and_timezone_type_spellings():
    """The reference's own DDL (readme.md:111-116) declares
    LowCardinality(String) and DateTime columns — the DESCRIBE TABLE
    text a user would paste into the 'columns' option. LowCardinality
    is storage-side (wire encoding = inner type); a declared column
    timezone changes nothing about epoch-based binary values."""
    assert _enc("LowCardinality(String)", "app") == b"\x03app"
    assert _enc("Nullable(LowCardinality(String))", None) == b"\x01"
    assert _enc("LowCardinality(Nullable(String))", "x") == b"\x00\x01x"
    t = dt.datetime(1970, 1, 1, 0, 1, 40)
    assert _enc("DateTime('UTC')", t) == _enc("DateTime", t)
    assert _enc("DateTime64(6, 'Asia/Shanghai')", t) == _enc(
        "DateTime64(6)", t
    )
    with pytest.raises(ValueError, match="precision is 0..9"):
        codec_for("DateTime64(12, 'UTC')")


def test_reference_log_table_ddl_encodes_verbatim(spark):
    """The reference's published ClickHouse log-table DDL
    (/root/reference/readme.md:109-123: repo/name/host/logger/level
    LowCardinality(String), created_at DateTime, message/context/extra
    String) pasted VERBATIM as the sink's column layout must encode a
    parsed monolog row end-to-end — the exact switch-over path a
    log2ck user takes: keep their table, point this engine's
    row_binary sink at it."""
    from urllib.parse import parse_qs, urlparse

    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    ddl_columns = [
        "repo LowCardinality(String)",
        "name LowCardinality(String)",
        "host LowCardinality(String)",
        "created_at DateTime",
        "logger LowCardinality(String)",
        "level LowCardinality(String)",
        "message String",
        "context String",
        "extra String",
    ]
    srv = _RecordingCKServer()
    try:
        df = spark.createDataFrame(
            [
                (
                    "demo-repo",
                    "app-log",
                    "host-1",
                    dt.datetime(2024, 1, 1, 10, 0, 0),
                    "app",
                    "ERROR",
                    "boom",
                    '{"k": 7}',
                    "[]",
                )
            ],
            "repo string, name string, host string,"
            " created_at timestamp, logger string, level string,"
            " message string, context string, extra string",
        ).coalesce(1)
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "repo",
                    "format": "row_binary",
                    "columns": ddl_columns,
                },
            )
        )
        writer(df, 0)
        path, body = srv.requests[0]
        q = parse_qs(urlparse(path).query)["query"][0]
        assert q == (
            "INSERT INTO repo (`repo`, `name`, `host`, `created_at`,"
            " `logger`, `level`, `message`, `context`, `extra`)"
            " FORMAT RowBinary"
        )
        epoch = int(
            dt.datetime(2024, 1, 1, 10, 0, 0)
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )
        expect = (
            b"\x09demo-repo"
            + b"\x07app-log"
            + b"\x06host-1"
            + struct.pack("<I", epoch)
            + b"\x03app"
            + b"\x05ERROR"
            + b"\x04boom"
            + b"\x08" + b'{"k": 7}'
            + b"\x02[]"
        )
        assert body == expect
    finally:
        srv.close()


def test_fixed_string_pad_and_reject():
    assert _enc("FixedString(4)", "ab") == b"ab\x00\x00"
    assert _enc("FixedString(3)", b"\x01\x02\x03") == b"\x01\x02\x03"
    with pytest.raises(ValueError, match="exceeds FixedString"):
        _enc("FixedString(2)", "abc")
    # multibyte counts BYTES, not codepoints
    assert _enc("FixedString(4)", "é") == b"\xc3\xa9\x00\x00"
    with pytest.raises(ValueError, match="positive"):
        codec_for("FixedString(0)")
    assert _enc("Nullable(FixedString(2))", None) == b"\x01"


def test_uuid_little_endian_halves():
    """CK's UUID wire layout is two LE UInt64 halves, NOT the RFC 4122
    big-endian byte string — a byte-swap bug lands valid-looking but
    WRONG UUIDs, so pin the exact bytes."""
    import uuid

    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    got = _enc("UUID", u)
    assert got == bytes.fromhex("7766554433221100ffeeddccbbaa9988")
    assert _enc("UUID", str(u)) == got  # string form accepted
    with pytest.raises(ValueError, match="not a UUID"):
        _enc("UUID", "not-a-uuid")


def test_enum_member_mapping_and_validation():
    t = "Enum8('a' = 1, 'b' = 2)"
    assert _enc(t, "a") == b"\x01"
    assert _enc(t, "b") == b"\x02"
    assert _enc(t, 2) == b"\x02"  # raw declared value accepted
    with pytest.raises(ValueError, match="not a declared"):
        _enc(t, "c")
    with pytest.raises(ValueError, match="not a declared"):
        _enc(t, 3)
    # Enum16 width + negative values + escaped quote in a member name
    t16 = r"Enum16('x' = -300, 'it\'s' = 7)"
    assert _enc(t16, "x") == struct.pack("<h", -300)
    assert _enc(t16, "it's") == struct.pack("<h", 7)
    # member value outside the storage width fails at PARSE time
    with pytest.raises(ValueError, match="outside Int8"):
        codec_for("Enum8('big' = 200)")


def test_ip_address_encodings():
    # IPv4: UInt32, little-endian of the numeric address
    assert _enc("IPv4", "1.2.3.4") == struct.pack("<I", 0x01020304)
    # IPv6: 16 network-order bytes
    assert _enc("IPv6", "2001:db8::1") == bytes.fromhex(
        "20010db8000000000000000000000001"
    )
    # IPv4 into an IPv6 column rides the ::ffff: mapped form
    assert _enc("IPv6", "1.2.3.4") == bytes.fromhex(
        "00000000000000000000ffff01020304"
    )
    with pytest.raises(ValueError, match="IPv4"):
        _enc("IPv4", "2001:db8::1")


def test_map_and_tuple_encodings():
    m = _enc("Map(String, Int64)", {"a": 1, "bb": 2})
    assert m == b"\x02" + b"\x01a" + struct.pack("<q", 1) + b"\x02bb" + struct.pack("<q", 2)
    assert _enc("Map(String, Int64)", {}) == b"\x00"
    # nested value types parse through the top-level comma splitter
    nested = _enc("Map(String, Array(Int64))", {"k": [1]})
    assert nested == b"\x01\x01k\x01" + struct.pack("<q", 1)
    # bare tuple: concatenated elements, no count prefix
    t = _enc("Tuple(Int64, String)", (7, "x"))
    assert t == struct.pack("<q", 7) + b"\x01x"
    # named tuple (the DESCRIBE text form) accepts dicts AND positionals
    named = "Tuple(a Int64, b Nullable(String))"
    assert _enc(named, {"b": None, "a": 7}) == struct.pack("<q", 7) + b"\x01"
    assert _enc(named, (7, "y")) == struct.pack("<q", 7) + b"\x00\x01y"
    with pytest.raises(ValueError, match="arity"):
        _enc("Tuple(Int64, String)", (1,))
    with pytest.raises(ValueError, match="missing field"):
        _enc(named, {"a": 1})
    # Spark Row values (tuple subclass) encode positionally
    from pyspark.sql import Row

    assert _enc(named, Row(a=7, b="y")) == struct.pack("<q", 7) + b"\x00\x01y"


def test_map_and_struct_schema_inference(spark):
    from log2ck_spark.formats import ck_columns_for_schema

    df = spark.createDataFrame(
        [({"k": 1}, (1, "x"))],
        "props map<string,bigint>, geo struct<lat:bigint,city:string>",
    )
    cols = dict(ck_columns_for_schema(df.schema))
    # map keys are never Nullable (CK constraint); values keep theirs
    assert cols["props"] == "Nullable(Map(String, Nullable(Int64)))"
    assert cols["geo"] == (
        "Nullable(Tuple(lat Nullable(Int64), city Nullable(String)))"
    )
    # and the inferred text round-trips through the parser
    for t in cols.values():
        codec_for(t)


def test_map_struct_columns_end_to_end(spark):
    """Executor-side reality check for the r11 codecs: Spark MapType
    arrives as dict and StructType as Row inside the writer — drive a
    real batch through the inferred layout and decode the wire."""
    from log2ck_spark.config import SinkConfig
    from log2ck_spark.sink import writer_for
    from tests.test_clickhouse_sink import _RecordingCKServer

    srv = _RecordingCKServer()
    try:
        df = spark.createDataFrame(
            [({"k": 7}, (1, "x"))],
            "props map<string,bigint>, geo struct<lat:bigint,city:string>",
        ).coalesce(1)
        writer = writer_for(
            SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "t",
                    "format": "row_binary",
                    "columns": "infer",
                },
            )
        )
        writer(df, 0)
        (_p, body), = srv.requests
        expect = (
            b"\x00"                      # props not null
            + b"\x01"                    # 1 map entry
            + b"\x01k"                   # key "k"
            + b"\x00" + struct.pack("<q", 7)   # Nullable(Int64) value
            + b"\x00"                    # geo not null
            + b"\x00" + struct.pack("<q", 1)   # lat
            + b"\x00\x01x"               # city
        )
        assert body == expect
    finally:
        srv.close()


def test_tail_to_reference_ddl_describe_stream_end_to_end(spark, tmp_path):
    """THE production topology for a reference user: tail a monolog
    file, parse, and stream FORMAT RowBinary into the reference's own
    published table shape — all non-Nullable LowCardinality(String)/
    DateTime/String columns plus a MATERIALIZED log_date — with ZERO
    sink config beyond url+table+format: the layout comes from
    DESCRIBE TABLE. Proves (a) the DESCRIBE default encodes a
    non-Nullable table correctly (no flag bytes), (b) the engine's
    derived log_date parquet-layout column is dropped rather than
    shipped (the server materializes it), and (c) the gzip default
    composes with the binary stream."""
    from urllib.parse import parse_qs, urlparse

    from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
    from log2ck_spark.streaming import run_ingest_stream, stop_all
    from tests.test_clickhouse_sink import _RecordingCKServer

    describe = (
        "repo\tLowCardinality(String)\t\t\t\t\t\n"
        "name\tLowCardinality(String)\t\t\t\t\t\n"
        "host\tLowCardinality(String)\t\t\t\t\t\n"
        "created_at\tDateTime\t\t\t\t\t\n"
        "logger\tLowCardinality(String)\t\t\t\t\t\n"
        "level\tLowCardinality(String)\t\t\t\t\t\n"
        "message\tString\t\t\t\t\t\n"
        "context\tString\t\t\t\t\t\n"
        "extra\tString\t\t\t\t\t\n"
        "log_date\tDate\tMATERIALIZED\ttoDate(created_at)\t\t\t\n"
    )
    srv = _RecordingCKServer(describe_tsv=describe)
    try:
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "app.log").write_text(
            "[2024-01-01 10:00:00] app.ERROR: boom {} []\n"
        )
        config = EngineConfig(
            tails=[TailSpec(
                name="app-log", path=str(logs / "*.log"),
                repo="demo-repo", host="host-1",
            )],
            sink=SinkConfig(
                kind="clickhouse_http",
                options={
                    "url": srv.url,
                    "table": "repo",
                    "format": "row_binary",
                },
            ),
            checkpoint_root=str(tmp_path / "ckpt"),
            trigger_seconds=1,
        )
        run_ingest_stream(spark, config, config.tails[0])
        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline and not srv.requests:
            _t.sleep(0.5)
        assert srv.requests, "no insert arrived"
        path, body = srv.requests[0]
        q = parse_qs(urlparse(path).query)["query"][0]
        # log_date is NOT in the insert — it is the server's job
        assert "log_date" not in q
        assert q.endswith("FORMAT RowBinary")
        assert all(enc == "gzip" for _p, _l, enc, _h in srv.wire)
        # decode under the DataFrame's column order, SERVER's types:
        # parse the insert's own column list, then walk the body
        names = [
            c.strip("` ") for c in
            q[q.index("(") + 1:q.index(")")].split(",")
        ]
        off = 0
        row = {}
        for col in names:
            if col == "created_at":
                secs = struct.unpack("<I", body[off:off + 4])[0]
                off += 4
                row[col] = dt.datetime(1970, 1, 1) + dt.timedelta(
                    seconds=secs
                )
            else:
                ln = body[off]; off += 1  # short strings: 1-byte varint
                row[col] = body[off:off + ln].decode(); off += ln
        assert off == len(body)  # one row, no flag bytes, no leftovers
        assert row == {
            "repo": "demo-repo",
            "name": "app-log",
            "host": "host-1",
            "created_at": dt.datetime(2024, 1, 1, 10, 0, 0),
            "logger": "app",
            "level": "ERROR",
            "message": "boom",
            "context": "{}",
            "extra": "[]",
        }
    finally:
        stop_all(spark)
        srv.close()
