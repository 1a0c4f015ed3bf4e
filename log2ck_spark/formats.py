"""ClickHouse RowBinary encoding — the compact binary insert format.

The reference inserts over the native TCP protocol
(`/root/reference/composer.json:20`, `src/Worker.php:71-80`); this
repo's CK sink speaks the public HTTP interface. JSONEachRow (the
default) is debuggable but pays JSON text encode + server-side parse
per value. `FORMAT RowBinary` over the same HTTP endpoint carries the
values in the native column binary encodings — fixed-width
little-endian numerics, LEB128-length strings — which is the bulk of
the native protocol's efficiency without the TCP framing or an
optional client lib. The format is published in ClickHouse's
interfaces/formats documentation; every encoding below follows that
public spec:

  * UInt8/16/32/64, Int8/16/32/64 — little-endian fixed width
  * Float32/64 — IEEE little-endian (non-finite values ride natively,
    unlike JSONEachRow where they must degrade to null)
  * Bool — one byte 0/1
  * String — LEB128 varint byte length + raw bytes (str → UTF-8;
    bytes pass through untouched, so BINARY columns need no base64)
  * Date — UInt16 days since 1970-01-01 (CK range 1970..2149);
    Date32 — Int32 days (signed, pre-1970 representable)
  * DateTime — UInt32 epoch seconds; DateTime64(p) — Int64 ticks at
    10^-p seconds, computed in exact integer arithmetic (a float
    multiply drops microseconds past epoch ~2.8e8 s)
  * Decimal(P,S), P <= 18 — Int64 of value * 10^S
  * Nullable(T) — one flag byte (0 = value follows, 1 = NULL)
  * Array(T) — LEB128 element count + encoded elements

Out-of-range values (a pre-1970 DateTime, a Date past 2149, an int
too wide for its declared width) raise ValueError — failing the Spark
task loudly, the same correct-by-crash posture as ANSI mode —
because RowBinary has no server-side parse step left to catch a
mangled value; silent modular wraparound would be data corruption.

Column types are declared as ClickHouse type strings (the same text a
user reads from `DESCRIBE TABLE`), or inferred from a Spark schema by
`ck_columns_for_schema` (nullable Spark fields become Nullable(T)).
Both the parser and the inferrer run at WRITER CREATION so an
unsupported type is a config-time error, not a first-batch task
failure (sink.writer_for's fail-loudly contract).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import re
import struct
from collections.abc import Iterator

_EPOCH_DATE = _dt.date(1970, 1, 1)
_UTC = _dt.timezone.utc

_INT_SPECS = {
    "Int8": ("<b", None), "Int16": ("<h", None),
    "Int32": ("<i", None), "Int64": ("<q", None),
    "UInt8": ("<B", None), "UInt16": ("<H", None),
    "UInt32": ("<I", None), "UInt64": ("<Q", None),
}


def _varint(n: int) -> bytes:
    """Unsigned LEB128 — CK's length/count prefix encoding."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _epoch_us(v: _dt.datetime) -> int:
    """Exact integer microseconds since the epoch, UTC. Spark hands
    naive datetimes (session is forced UTC); a tz-aware one is
    normalized to its UTC instant — same policy as the JSONEachRow
    serializer."""
    if v.tzinfo is not None:
        v = v.astimezone(_UTC)
    else:
        v = v.replace(tzinfo=_UTC)
    days = (v.date() - _EPOCH_DATE).days
    secs = days * 86400 + v.hour * 3600 + v.minute * 60 + v.second
    return secs * 1_000_000 + v.microsecond


class _Codec:
    """One column type's encoder. Subclasses encode ONE value to the
    buffer; Nullable/Array compose them."""

    def encode(self, v, out: bytearray) -> None:  # pragma: no cover
        raise NotImplementedError

    def _null_rejected(self, ck_type: str):
        return ValueError(
            f"NULL in non-Nullable RowBinary column ({ck_type}) — "
            f"declare the column Nullable(...) or filter upstream"
        )


class _IntCodec(_Codec):
    def __init__(self, ck_type: str):
        self.ck_type = ck_type
        self.fmt = _INT_SPECS[ck_type][0]

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected(self.ck_type)
        try:
            out += struct.pack(self.fmt, v)
        except struct.error as e:
            raise ValueError(
                f"value {v!r} out of range for {self.ck_type}"
            ) from e


class _FloatCodec(_Codec):
    def __init__(self, ck_type: str):
        self.ck_type = ck_type
        self.fmt = "<f" if ck_type == "Float32" else "<d"

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected(self.ck_type)
        out += struct.pack(self.fmt, float(v))


class _BoolCodec(_Codec):
    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected("Bool")
        out.append(1 if v else 0)


class _StringCodec(_Codec):
    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected("String")
        b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        out += _varint(len(b))
        out += bytes(b)


class _DateCodec(_Codec):
    """Date → UInt16 days (1970..2149); Date32 → Int32 days."""

    def __init__(self, wide: bool):
        self.wide = wide

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected("Date32" if self.wide else "Date")
        if isinstance(v, _dt.datetime):
            v = v.date()
        days = (v - _EPOCH_DATE).days
        fmt = "<i" if self.wide else "<H"
        try:
            out += struct.pack(fmt, days)
        except struct.error as e:
            raise ValueError(
                f"date {v.isoformat()} outside "
                f"{'Date32' if self.wide else 'Date (1970..2149)'} range"
            ) from e


class _DateTimeCodec(_Codec):
    """DateTime → UInt32 epoch seconds; DateTime64(p) → Int64 ticks.

    Sub-second precision contract: a plain DateTime column is
    second-granular, so a timestamp's microseconds are TRUNCATED
    toward the floor — the same thing ClickHouse itself does when a
    fractional text timestamp lands in a DateTime column, and the
    unavoidable semantics of the UInt32-seconds wire slot. This is the
    module's one deliberate lossy conversion (documented, matching the
    server); declare DateTime64(6) to keep microseconds. DateTime64
    tick counts that overflow Int64 (a far-future instant at p=9)
    raise ValueError like every other out-of-range value here."""

    def __init__(self, precision: "int | None"):
        self.precision = precision

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected(
                "DateTime" if self.precision is None
                else f"DateTime64({self.precision})"
            )
        us = _epoch_us(v)
        if self.precision is None:
            secs, frac = divmod(us, 1_000_000)
            try:
                out += struct.pack("<I", secs)
            except struct.error as e:
                raise ValueError(
                    f"timestamp {v} outside DateTime (UInt32 epoch) range"
                    " — use DateTime64 for pre-1970 or post-2106 instants"
                ) from e
        else:
            p = self.precision
            # exact integer rescale, never a float multiply
            if p >= 6:
                ticks = us * 10 ** (p - 6)
            else:
                ticks = us // 10 ** (6 - p)
            try:
                out += struct.pack("<q", ticks)
            except struct.error as e:
                # e.g. year 9999 at p=9: 2.5e20 ticks > Int64 — the
                # same loud ValueError contract as every other
                # out-of-range value (a bare struct.error here would
                # escape the documented error type)
                raise ValueError(
                    f"timestamp {v} outside DateTime64({p}) Int64 tick"
                    " range — lower the precision"
                ) from e


class _DecimalCodec(_Codec):
    """Decimal(P,S) as the scaled integer value·10^S — in the width
    ClickHouse's RowBinary uses for that precision tier: Decimal32
    (P 1..9) is an Int32, Decimal64 (P 10..18) an Int64. Getting the
    width wrong doesn't fail one value — it misaligns every byte of
    the row stream after it."""

    def __init__(self, precision: int, scale: int):
        if not 1 <= precision <= 18:
            raise ValueError(
                f"Decimal({precision},{scale}): only 1 <= P <= 18 "
                f"(Decimal32/Decimal64 storage) is supported by this "
                f"encoder"
            )
        self.precision, self.scale = precision, scale
        self.fmt = "<i" if precision <= 9 else "<q"
        # a P-digit decimal's scaled integer is bounded by 10^P
        self.bound = 10 ** precision

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected(
                f"Decimal({self.precision},{self.scale})"
            )
        try:
            q = int(
                _decimal.Decimal(v).scaleb(self.scale).to_integral_exact(
                    rounding=_decimal.ROUND_HALF_UP
                )
            )
        except (_decimal.InvalidOperation, ValueError, TypeError) as e:
            raise ValueError(
                f"value {v!r} is not encodable as "
                f"Decimal({self.precision},{self.scale})"
            ) from e
        # enforce the DECLARED precision, not just the storage width:
        # ClickHouse does not re-validate Decimal ranges on binary
        # input, so an overflow here would land as corrupt data
        if not -self.bound < q < self.bound:
            raise ValueError(
                f"value {v!r} exceeds Decimal({self.precision},"
                f"{self.scale}) precision"
            )
        out += struct.pack(self.fmt, q)


class _NullableCodec(_Codec):
    def __init__(self, inner: _Codec):
        self.inner = inner

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            out.append(1)
        else:
            out.append(0)
            self.inner.encode(v, out)


class _ArrayCodec(_Codec):
    def __init__(self, inner: _Codec):
        self.inner = inner

    def encode(self, v, out: bytearray) -> None:
        if v is None:
            raise self._null_rejected("Array(...)")
        out += _varint(len(v))
        for x in v:
            self.inner.encode(x, out)


def codec_for(ck_type: str) -> _Codec:
    """Parse a ClickHouse type string into its encoder. Raises
    ValueError on anything unsupported — at writer creation, by
    contract."""
    t = ck_type.strip()
    # LowCardinality is a STORAGE property — over an HTTP RowBinary
    # insert the wire encoding is the plain inner type (the server
    # dictionary-encodes on write). The reference's own DDL declares
    # every log string column LowCardinality(String)
    # (/root/reference/readme.md:111-116), so a user pasting their
    # DESCRIBE TABLE text must not hit "unsupported type" here.
    m = re.fullmatch(r"LowCardinality\((.+)\)", t)
    if m:
        return codec_for(m.group(1))
    if t in _INT_SPECS:
        return _IntCodec(t)
    if t in ("Float32", "Float64"):
        return _FloatCodec(t)
    if t == "Bool":
        return _BoolCodec()
    if t == "String":
        return _StringCodec()
    if t == "Date":
        return _DateCodec(wide=False)
    if t == "Date32":
        return _DateCodec(wide=True)
    # DateTime['TZ'] / DateTime64(p[, 'TZ']): the binary wire value is
    # epoch-based, so a declared column timezone changes nothing here
    # (it only governs how the SERVER renders/parses text formats) —
    # accept and ignore it rather than reject the DESCRIBE TABLE text.
    if t == "DateTime" or re.fullmatch(r"DateTime\('[^']+'\)", t):
        return _DateTimeCodec(None)
    m = re.fullmatch(r"DateTime64\((\d+)(?:,\s*'[^']+')?\)", t)
    if m:
        p = int(m.group(1))
        if p > 9:
            # ClickHouse caps DateTime64 precision at 9; past that the
            # tick count also overflows Int64 for modern instants —
            # reject at CONFIG time, not in the first batch's tasks
            raise ValueError(
                f"DateTime64({p}): ClickHouse precision is 0..9"
            )
        return _DateTimeCodec(p)
    m = re.fullmatch(r"Decimal\((\d+),\s*(\d+)\)", t)
    if m:
        return _DecimalCodec(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"Nullable\((.+)\)", t)
    if m:
        return _NullableCodec(codec_for(m.group(1)))
    m = re.fullmatch(r"Array\((.+)\)", t)
    if m:
        return _ArrayCodec(codec_for(m.group(1)))
    raise ValueError(
        f"unsupported ClickHouse type for RowBinary encoding: {ck_type!r}"
    )


def ck_columns_for_schema(schema) -> "list[tuple[str, str]]":
    """Infer (name, ck_type) pairs from a Spark StructType — the
    zero-config path for the row_binary sink. Nullable Spark fields
    become Nullable(T); TimestampType maps to DateTime64(6) (Spark's
    microsecond precision, lossless)."""
    from pyspark.sql import types as T

    def _ck(dt, nullable: bool) -> str:
        if isinstance(dt, T.LongType):
            base = "Int64"
        elif isinstance(dt, T.IntegerType):
            base = "Int32"
        elif isinstance(dt, T.ShortType):
            base = "Int16"
        elif isinstance(dt, T.ByteType):
            base = "Int8"
        elif isinstance(dt, T.DoubleType):
            base = "Float64"
        elif isinstance(dt, T.FloatType):
            base = "Float32"
        elif isinstance(dt, T.BooleanType):
            base = "Bool"
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            base = "String"
        elif isinstance(dt, T.DateType):
            base = "Date32"
        elif isinstance(dt, T.TimestampType):
            base = "DateTime64(6)"
        elif isinstance(dt, T.DecimalType):
            base = f"Decimal({dt.precision},{dt.scale})"
        elif isinstance(dt, T.ArrayType):
            # array ELEMENTS keep their own nullability flag
            base = f"Array({_ck(dt.elementType, dt.containsNull)})"
        else:
            raise ValueError(
                f"no RowBinary mapping for Spark type {dt.simpleString()}"
                " — declare the sink's 'columns' option explicitly"
            )
        return f"Nullable({base})" if nullable else base

    return [(f.name, _ck(f.dataType, f.nullable)) for f in schema.fields]


def rows_to_row_binary(
    rows, columns: "list[tuple[str, str]]"
) -> Iterator[bytes]:
    """Lazily encode rows (Row / dict / sequence) into one RowBinary
    byte string PER ROW — a generator, so the HTTP batcher's memory
    stays bounded by batch_size, not partition size (the
    rows_to_json_each_row contract). Column ORDER is the declared
    order; the INSERT statement names the same columns in the same
    order, so the server never guesses."""
    codecs = [(name, codec_for(t)) for name, t in columns]
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else None
        out = bytearray()
        for i, (name, codec) in enumerate(codecs):
            # named access must FAIL on a missing name: under a
            # Nullable column a silent .get() default would insert
            # NULL for every row of a typo'd/drifted column name —
            # silent data loss, against this module's contract
            try:
                if d is not None:
                    v = d[name]
                elif isinstance(row, dict):
                    v = row[name]
                else:
                    v = row[i]
            except (KeyError, IndexError) as e:
                raise ValueError(
                    f"declared RowBinary column {name!r} is missing "
                    f"from the row (fields: "
                    f"{sorted(d) if d is not None else row!r})"
                ) from e
            codec.encode(v, out)
        yield bytes(out)
