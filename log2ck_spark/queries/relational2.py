"""Extended relational surface — set operations, pivot, rollup,
semi/anti joins, exact percentiles, sliding windows, typed JSON
structs, JSON-lines source round-trip, and two more TPC-H shapes.

Rounds out the Part B inventory to everything a log2ck/ClickHouse user
would express over the ingested table. Same scale rules as
relational.py: declarative plans, partial aggregation, broadcast dims,
no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import dsum, finite, oracle_dsum
from log2ck_spark.io import ensure_staged, scratch_dir, tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# Set operations: EXCEPT / INTERSECT / UNION
# --------------------------------------------------------------------------


@register(
    "set_except",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who clicked but never purchased. EXCEPT compiles to a
    left-anti hash join on the distinct sets — no sort, one shuffle."""
    ev = tbl(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.subtract(buyers)  # SQL set EXCEPT


@register(
    "set_intersect",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@register(
    "set_union",
    oracle="""
    SELECT user_id, 'error' AS src FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT user_id, 'signup' AS src FROM events WHERE event_type = 'signup'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.lit("error").alias("src")
    )
    b = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.lit("signup").alias("src")
    )
    return a.unionByName(b)


# --------------------------------------------------------------------------
# Pivot (wide counts per day x event_type)
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_agg",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values ⇒ single-pass conditional aggregation (no
    value-discovery job, required for a deterministic schema at scale)."""
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


# --------------------------------------------------------------------------
# ROLLUP hierarchy totals
# --------------------------------------------------------------------------


@register(
    "cube_rollup",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
           CAST(MONTH(o_orderdate) AS INTEGER) AS m,
           COUNT(*) AS n,
           {revenue}
    FROM orders GROUP BY ROLLUP(y, m)
    HAVING COUNT(*) > 0
    """.format(revenue=oracle_dsum("o_totalprice", "revenue")),
)
def cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup(year, month): per-month, per-year and grand-total rows in
    one pass (Expand + single aggregation — not three scans).

    Empty-input contract (--empty gate, r11): Spark's ROLLUP —
    DataFrame .rollup() AND SQL GROUP BY ROLLUP, probed on 4.1 — emits
    NO rows over empty input, while ANSI/DuckDB emit the grand-total
    grouping set's single n=0 row. The engine contract here is
    Spark's: ROLLUP reports OBSERVED groups only. The oracle mirrors
    it with HAVING COUNT(*) > 0 — a no-op on any non-empty input
    (every rollup/subtotal/grand-total group over existing rows has
    n >= 1), exact on the empty one."""
    return (
        tbl(spark, sf_dir, "orders")
        .rollup(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "revenue"))
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS segment, COUNT(*) AS n_customers
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'without_orders' AS segment, COUNT(*) AS n_customers
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS as left_semi / left_anti joins — no
    row-multiplication, the build side is just the distinct key set."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("with_orders").alias("segment"), "n_customers")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("without_orders").alias("segment"), "n_customers")
    )
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# Exact percentiles (quantile_cont semantics)
# --------------------------------------------------------------------------


@register(
    "percentile_agg",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS median_value,
           quantile_cont(value, 0.9) AS p90_value,
           COUNT(*) AS n
    FROM events
    -- observation set = FINITE values (--nonfinite contract; see
    -- functions.numeric.finite): DuckDB's quantile_cont counts NaN as
    -- the largest observation while Spark's percentile excludes it,
    -- and ±Inf poisons interpolation on both — n counts the same
    -- filtered observations so the denominators stay comparable.
    WHERE isfinite(value)
    GROUP BY event_type
    """,
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition (verified
    bit-identical). At 100 TB switch to `approx_percentile` (KLL/GK
    sketch) — kept exact here so the oracle can check it. Observations
    are the finite values (functions.numeric.finite, --nonfinite)."""
    return (
        tbl(spark, sf_dir, "events")
        .where(finite("value"))
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("median_value"),
            F.percentile("value", 0.9).alias("p90_value"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Sliding event-time windows
# --------------------------------------------------------------------------


@register(
    "sliding_window_agg",
    oracle="""
    WITH base AS (
      SELECT *,
             CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS anchor
      FROM events
    ), expanded AS (
      SELECT event_type, value,
             anchor - 300 * i AS win_start_s
      FROM base, (SELECT unnest([0, 1]) AS i)
      WHERE epoch(ts) - (anchor - 300 * i) < 600
    )
    SELECT make_timestamp(win_start_s * 1000000) AS win_start,
           event_type,
           COUNT(*) AS n,
           {sum_value}
    FROM expanded GROUP BY 1, 2
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2
    windows (Spark expands then aggregates; the oracle reproduces the
    expansion with unnest)."""
    win = F.window(F.col("ts"), "10 minutes", "5 minutes")
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )


# --------------------------------------------------------------------------
# Typed JSON: from_json into a struct (vs per-key get_json_object)
# --------------------------------------------------------------------------


@register(
    "from_json_struct",
    oracle="""
    SELECT TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                    AS INTEGER) AS k,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                   AS INTEGER) >= 50
    GROUP BY 1
    """,
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema: one parse per row into a
    typed struct (vs one JSON scan per get_json_object call) — the
    right shape when several keys are extracted. from_json is
    PERMISSIVE (null struct/field on malformed or wrong-typed input),
    so the oracle mirrors with TRY_CAST-to-JSON + TRY_CAST-to-int —
    DuckDB's json_extract_string raises on malformed JSON and ANSI
    CAST raises on non-numeric k (r9 --badjson gate)."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "p", F.from_json("props", "k int")
    )
    return (
        ev.filter(F.col("p.k") >= 50)
        .groupBy(F.col("p.k").alias("k"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# JSON-lines source round-trip (A1 variant for structured logs)
# --------------------------------------------------------------------------


@register(
    "ingest_json_lines",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids, {sum_value}
    FROM events
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def ingest_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-log ingestion: write events as JSON lines, read back
    with an explicit schema (no inference job — mandatory at scale),
    aggregate. Exercises the JSON source the streaming path shares."""
    def _stage(p: str) -> None:
        ev = tbl(spark, sf_dir, "events")
        ev.select(
            F.to_json(
                F.struct("event_id", "user_id", "event_type", "value")
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_staged(scratch_dir(sf_dir, "json_corpus"), _stage)
    schema = "event_id bigint, user_id bigint, event_type string, value double"
    back = spark.read.schema(schema).json(path)
    return back.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        dsum("value", "sum_value"),
    )


# --------------------------------------------------------------------------
# TPC-H Q6 / Q5 shapes
# --------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT {revenue}, COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24.0
    """.format(revenue=oracle_dsum("l_extendedprice * l_discount", "revenue")),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan+filter+agg — every predicate pushes to the
    scan; the whole query is one codegen'd stage with a scalar result."""
    l = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.04, 0.06))
        & (F.col("l_quantity") < 24.0)
    )
    return l.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name, {revenue}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """.format(revenue=oracle_dsum("l_extendedprice * (1 - l_discount)", "revenue")),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join with a region filter. supplier/nation/
    region broadcast; the only big shuffle is lineitem⋈orders on
    orderkey. The c_nationkey = s_nationkey local-supplier condition
    rides on the customer join."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
    )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS as a LEFT SEMI join (one pass
    over lineitem filtered before the join — the discount predicate
    prunes the build side ahead of the shuffle, and the semi join emits each order at most once without
    deduplicating). This is the operator Catalyst rewrites EXISTS
    subqueries into; expressing it directly keeps the plan obvious."""
    o = tbl(spark, sf_dir, "orders")
    late = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, {sum_qty}
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,6))) > 300
    )
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """.format(sum_qty=oracle_dsum("l_quantity", "sum_qty")),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join. The HAVING filter runs on
    the aggregate BEFORE joining orders/customer, so the join probe
    side is only the surviving big orders (tiny) — broadcast-able at
    any corpus size, vs the naive join-then-aggregate plan whose
    shuffle carries every lineitem row through both joins. Dates
    formatted as strings (cross-engine-stable round-trip)."""
    big = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# Time-grid resample with forward fill (gauge downsampling)
# --------------------------------------------------------------------------


@register(
    "resample_ffill",
    oracle="""
    WITH ev AS (
      SELECT event_type, value,
             make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600000000
                                 AS BIGINT)) AS bkt,
             ts, event_id
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), lastv AS (
      SELECT event_type, bkt, value FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type, bkt
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev) WHERE rn = 1
    ), bounds AS (
      SELECT event_type, MIN(bkt) AS mn, MAX(bkt) AS mx
      FROM lastv GROUP BY event_type
    ), grid AS (
      SELECT event_type,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bkt
      FROM bounds
    )
    SELECT g.event_type,
           strftime(g.bkt, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           ROUND(last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bkt
             ROWS UNBOUNDED PRECEDING), 3) AS value,
           CAST(l.value IS NULL AS INTEGER) AS filled
    FROM grid g LEFT JOIN lastv l
      ON g.event_type = l.event_type AND g.bkt = l.bkt
    """,
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each event type to a dense hourly grid, carrying the
    last observed value across empty hours (gauge semantics) — the
    dashboard/timeseries-export query of log analytics, and the batch
    analog of what a metrics TSDB does on scrape gaps.

    Plan: per-(type, hour) last value via one row_number window; the
    per-type [min, max] hour bounds are a tiny agg whose `sequence()`
    explode GENERATES the dense grid as a column expression (no
    driver-side loop, no calendar table to maintain); grid left-joins
    the observed hours and one final per-type window forward-fills.
    Everything shuffles on event_type x hour or event_type — bounded
    keys, bounded grid (span/width rows per type). The gap flag is
    emitted so downstream can distinguish observed from carried
    points."""
    ev = (
        tbl(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            "ts",
            "event_id",
            F.window("ts", "1 hour").start.alias("bkt"),
        )
    )
    wlast = Window.partitionBy("event_type", "bkt").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    lastv = (
        ev.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("event_type", "bkt", "value")
    )
    bounds = lastv.groupBy("event_type").agg(
        F.min("bkt").alias("mn"), F.max("bkt").alias("mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("bkt"),
    )
    wfill = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(lastv, ["event_type", "bkt"], "left")
        .select(
            "event_type",
            F.date_format("bkt", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            F.round(
                F.last("value", ignorenulls=True).over(wfill), 3
            ).alias("value"),
            F.col("value").isNull().cast("int").alias("filled"),
        )
    )


@register(
    "agg_map_sum",
    oracle="""
    SELECT event_type, k.key,
           CAST(SUM(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                                                 k.key) AS INTEGER))
                AS BIGINT) AS total,
           COUNT(*) AS n_rows
    FROM events
    CROSS JOIN (SELECT unnest(['k']) AS key) k
    WHERE TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), k.key)
                   AS INTEGER) IS NOT NULL
    GROUP BY 1, 2
    """,
)
def agg_map_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sumMap` analog: the JSON props payload parsed to a
    real MapType and aggregated per (group, map key) — key-wise sums
    over heterogeneous metric bags (the CK idiom for counters shipped
    as maps). The Spark side does the honest map path (`from_json` →
    `explode(map)` → group-sum), so NEW keys appearing in the data
    flow through with no schema change; the oracle derives the
    expected sums from the fixture's known key set independently.

    Shape: parse + explode are scan-stage expressions; one partial-
    combined agg on (group, key) — cardinality = groups × live keys,
    not rows.

    Parse as map<string,STRING> and try_cast each value — not
    map<string,int>: a metric bag with ONE non-integer value (a label
    string, a nested object) would null the WHOLE map under the int
    parse, silently dropping the row's valid counters while the
    oracle's per-key extraction keeps them (found by the r10 --jumbo
    gate via a 50 KB string pad key riding next to k). Per-entry
    try_cast keeps the valid counters and drops only the non-numeric
    entries, matching the oracle's TRY_CAST(... AS INTEGER) IS NOT
    NULL filter on the counter domain (JSON INTEGER values). Known
    engine asymmetry on NON-integral numerics — Spark's
    try_cast('7.5' as int) is NULL where DuckDB's TRY_CAST rounds to
    8 — is PARITY.md's documented decimal-string corner (pinned by
    test_decimal_string_json_k_corner); sumMap-style counters are
    integers by contract."""
    ev = tbl(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_type", F.explode(m).alias("key", "val_s"))
        .select(
            "event_type",
            "key",
            F.col("val_s").try_cast("int").alias("val"),
        )
        .filter(F.col("val").isNotNull())
        .groupBy("event_type", "key")
        .agg(
            F.sum("val").cast("bigint").alias("total"),
            F.count("*").alias("n_rows"),
        )
    )
