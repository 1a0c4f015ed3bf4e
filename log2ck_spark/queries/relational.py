"""Part B query surface (SURVEY.md §2 Part B) — what the reference
delegates to ClickHouse (`/root/reference/readme.md:106-125`), owned
natively here as Catalyst-optimized DataFrame plans.

Scale notes (100 TB design):
* Filters/projections are expressed declaratively so Catalyst pushes
  them into the parquet scan (PushedFilters / ReadSchema pruning).
* Dimension joins broadcast explicitly (`F.broadcast`) — nation/region/
  customer-like dims stay small even at SF-100k; the fact table never
  shuffles for them.
* Double-typed aggregates go through exact decimal partial aggregation
  (see functions.numeric) — order-independent, so results are identical
  on 1 partition or 10,000.
* Top-k uses orderBy+limit which Spark executes as TakeOrderedAndProject
  (per-partition heap + driver merge of k rows — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log2ck_spark.functions.numeric import DECIMAL, davg, dsum, oracle_davg, oracle_dsum
from log2ck_spark.io import ensure_staged, scratch_dir, tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# B1 scan_partition_prune — date-partitioned layout + partition pruning
# (reference: PARTITION BY toDate(created_at), readme.md:121)
# --------------------------------------------------------------------------


@register(
    "scan_partition_prune",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           COUNT(*) AS n,
           {sum_value}
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
    GROUP BY 1
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the sink layout the reference's DDL implies
    (PARTITION BY toDate(created_at)) and query it with a date
    predicate; Catalyst's PruneFileSourcePartitions reads only the 7
    matching date directories. At 100 TB this is the difference between
    scanning 10 days and scanning 10 years."""
    staged = tbl(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )

    def _stage(p: str) -> None:
        staged.write.mode("overwrite").partitionBy("event_date").parquet(p)

    out = ensure_staged(scratch_dir(sf_dir, "events_by_date"), _stage)
    # Explicit schema (the writer's own) instead of inference: skips
    # the footer-sampling job, pins drift, and — degenerate contract —
    # a zero-row source writes no partition directories at all, which
    # schema inference fails on where an explicit schema reads empty.
    df = spark.read.schema(staged.schema).parquet(out).filter(
        F.col("event_date").between("2024-01-05", "2024-01-11")
    )
    # date rendered as string: DATE-typed outputs round-trip differently
    # through pandas in Spark (datetime.date) vs DuckDB (datetime64)
    return df.groupBy(
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count("*").alias("n"), dsum("value", "sum_value"))


# --------------------------------------------------------------------------
# B2 sort_within — ORDER BY sort key layout → parquet row-group skipping
# (reference: ORDER BY (created_at, repo, host), readme.md:122)
# --------------------------------------------------------------------------


@register(
    "sort_within",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-02-01'
    """,
)
def sort_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions on the range key: Spark's stand-in for the
    MergeTree primary index. Sorted row groups give parquet min/max
    stats real skipping power for time-range scans; the sort is
    per-partition (no shuffle)."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
        )
        .sortWithinPartitions("l_shipdate")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


# --------------------------------------------------------------------------
# B3 ttl_expire — TTL retention (reference: TTL created_at + INTERVAL 10
# DAY, readme.md:123). The maintenance job that drops partitions lives in
# log2ck_spark.maintenance; this query is the logical TTL predicate.
# --------------------------------------------------------------------------


@register(
    "ttl_expire",
    oracle="""
    SELECT COUNT(*) AS n_live,
           MIN(ts) AS min_live_ts,
           MAX(ts) AS max_live_ts
    FROM events
    WHERE ts > (SELECT MAX(ts) FROM events) - INTERVAL 10 DAY
    """,
)
def ttl_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 DAYS")).alias("cutoff")
    )
    return (
        ev.crossJoin(F.broadcast(horizon))
        .filter(F.col("ts") > F.col("cutoff"))
        .agg(
            F.count("*").alias("n_live"),
            F.min("ts").alias("min_live_ts"),
            F.max("ts").alias("max_live_ts"),
        )
    )


# --------------------------------------------------------------------------
# B5 filter_predicate — WHERE level/time/value pushdown
# --------------------------------------------------------------------------


@register(
    "filter_predicate",
    oracle="""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE event_type = 'error'
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
      AND value > 5.0
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical log query: WHERE level='error' AND time range.

    The fixture's ts reads as a plain TIMESTAMP under io.tbl()'s UTC
    session zone (inferTimestampNTZ disabled), so Catalyst pushes all
    three predicates — equality, timestamp range, numeric — straight
    into the parquet scan (PushedFilters) and prunes row groups via
    min/max stats. No manual literal translation needed."""
    return (
        tbl(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "error")
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
            & (F.col("value") > 5.0)
        )
        .select("event_id", "ts", "user_id", "value")
    )


# --------------------------------------------------------------------------
# B6 project_columns — column pruning
# --------------------------------------------------------------------------


@register(
    "project_columns",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem WHERE l_quantity < 5.0
    """,
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-column projection of an 11-column table: ReadSchema in the
    physical plan shows only the referenced columns are decoded."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 5.0)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# --------------------------------------------------------------------------
# B7 agg_group_count — hash aggregation (counts / distinct / sums by level)
# --------------------------------------------------------------------------


@register(
    "agg_group_count",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           {total_value},
           {avg_value}
    FROM events
    GROUP BY event_type
    """.format(
        total_value=oracle_dsum("value", "total_value"),
        avg_value=oracle_davg("value", "avg_value"),
    ),
)
def agg_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashAggregateExec with partial (map-side) + final aggregation —
    the shuffle carries one row per (partition, event_type), not per
    event. count(distinct) expands to a two-phase aggregate."""
    return tbl(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value", "total_value"),
        davg("value", "avg_value"),
    )


# --------------------------------------------------------------------------
# B7b agg_sum_audited — the exact-sum domain contract, made observable
# --------------------------------------------------------------------------


@register(
    "agg_sum_audited",
    oracle="""
    SELECT event_type,
           {total_value},
           COUNT(value)
             - COUNT(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6)))
             AS excluded_count,
           COUNT(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6)))
             AS included_count
    FROM events
    GROUP BY event_type
    """.format(total_value=oracle_dsum("value", "total_value")),
)
def agg_sum_audited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dsum with an EXCLUDED-COUNT companion (VERDICT r10 item 5).

    The exact-aggregate chain (functions/numeric.py) NULL-skips values
    the decimal(18,6) domain can't hold (|x| >= 1e12, NaN, ±Inf) —
    identically on both engines, but silently. This query is the
    documented opt-in audit pattern: alongside the sum it emits
    ``excluded_count`` = non-NULL source values the exact sum dropped
    (count(value) − count(try_cast(value))) and ``included_count``, so
    a pipeline summing wide-range measures (byte counters, durations)
    can ALERT on exclusion instead of discovering it in an audit. Both
    counts reuse the proven try_cast primitives, so the predicate is
    bit-identical to what dsum itself skipped. Zero extra shuffles —
    the counts ride the same partial+final hash aggregate as the sum.
    """
    d = F.col("value").try_cast(DECIMAL)
    return tbl(spark, sf_dir, "events").groupBy("event_type").agg(
        dsum("value", "total_value"),
        (F.count("value") - F.count(d)).alias("excluded_count"),
        F.count(d).alias("included_count"),
    )


# --------------------------------------------------------------------------
# B8 agg_time_bucket — toDate/toStartOfHour-style bucketing
# --------------------------------------------------------------------------


@register(
    "agg_time_bucket",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS bucket,
           COUNT(*) AS n,
           {sum_value}
    FROM events
    GROUP BY 1
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def agg_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


# --------------------------------------------------------------------------
# B9 topk_order_limit — top-k (TakeOrderedAndProject)
# --------------------------------------------------------------------------


@register(
    "topk_order_limit",
    oracle="""
    SELECT user_id, {spend}, COUNT(*) AS n_purchases
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY spend DESC, user_id
    LIMIT 10
    """.format(spend=oracle_dsum("value", "spend")),
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: each partition
    keeps a k-row heap and only k rows per partition reach the driver —
    no global sort even over 10^12 rows. Ties broken by user_id so the
    k-set is deterministic (spend is decimal-exact)."""
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value", "spend"), F.count("*").alias("n_purchases"))
        .orderBy(F.desc("spend"), F.asc("user_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# B10 json_extract — JSON scalar functions over the `context`-like column
# (reference: readme.md:125 "refer to clickhouse's json query function")
# --------------------------------------------------------------------------


@register(
    "json_extract",
    oracle="""
    SELECT TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                    AS INTEGER) AS k,
           COUNT(*) AS n,
           {sum_value}
    FROM events
    GROUP BY 1
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object on the JSON-text `props` column (the analog of
    the reference's `context`/`extra` String columns). try_cast, not
    cast: real props carry non-numeric k values, and ANSI CAST kills
    the query where the intent is k = NULL; the oracle's
    TRY_CAST(props AS JSON) mirrors get_json_object's NULL-on-
    malformed (DuckDB's json_extract_string RAISES on bad JSON) —
    both found by the r9 --badjson gate."""
    return (
        tbl(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").try_cast("int"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


# --------------------------------------------------------------------------
# B11 string_match — LIKE / regex search over message-like text
# --------------------------------------------------------------------------


@register(
    "string_match",
    oracle="""
    SELECT source,
           COUNT(*) FILTER (WHERE text LIKE '%spark%') AS n_like,
           COUNT(*) FILTER (WHERE regexp_matches(text, 'spark (fast|query)')) AS n_regex,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def string_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regex match pushed through a single scan; conditional
    aggregation avoids two passes."""
    d = tbl(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.when(F.col("text").contains("spark"), 1).otherwise(0)).alias("n_like"),
        F.sum(
            F.when(F.col("text").rlike("spark (fast|query)"), 1).otherwise(0)
        ).alias("n_regex"),
        F.count("*").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# B12 datetime_funcs — toDate / interval arithmetic / calendar extraction
# --------------------------------------------------------------------------


@register(
    "datetime_funcs",
    oracle="""
    SELECT CAST(YEAR(ts) AS INTEGER) AS y,
           CAST(MONTH(ts) AS INTEGER) AS m,
           CAST(DAY(ts) AS INTEGER) AS d,
           COUNT(*) AS n,
           CAST(MIN(HOUR(ts)) AS INTEGER) AS first_hour,
           MIN(ts + INTERVAL 10 DAY) AS min_expiry
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").alias("y"), F.month("ts").alias("m"), F.dayofmonth("ts").alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.min(F.hour("ts")).alias("first_hour"),
        F.min(F.col("ts") + F.expr("INTERVAL 10 DAYS")).alias("min_expiry"),
    )


# --------------------------------------------------------------------------
# B13 join_dim — fact ⋈ dimension joins (logs × repo/host dims)
# --------------------------------------------------------------------------


@register(
    "join_dim",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_orders,
           {revenue}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """.format(revenue=oracle_dsum("o_totalprice", "revenue")),
)
def join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(orders) ⋈ customer ⋈ nation ⋈ region. nation and
    region are broadcast explicitly (25 / 5 rows — they stay tiny at any
    SF); customer is left to AQE, which will broadcast it while it fits
    and fall back to shuffled hash join beyond that. The fact table is
    never repartitioned by a dim key."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


# --------------------------------------------------------------------------
# B14 approx_distinct — HLL approximate distinct. Rows-only for five
# rounds ("HLL impls differ between engines"), but the repo built its
# own counter-evidence: sketches.hll_group_stats replays the published
# Flajolet et al. HLL bit-exactly in DuckDB (md5 registers, scaled-
# integer harmonic sum), so the ESTIMATE itself is now the value-
# checked output — the registry's last asterisk removed. Exact distinct
# stays oracle-checked in agg_group_count / distinct_exact.
# --------------------------------------------------------------------------


def _approx_distinct_oracle() -> str:
    from log2ck_spark.queries.sketches import hll_oracle_cte

    return (
        hll_oracle_cte("events", "event_type", "user_id")
        + """
    , counts AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT c.event_type,
           CAST(COALESCE(ROUND(h.est, 0), 0) AS BIGINT) AS approx_users,
           c.n
    FROM counts c LEFT JOIN hll_est h
      ON c.event_type IS NOT DISTINCT FROM h.event_type
    """
    )


@register("approx_distinct", oracle=_approx_distinct_oracle())
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group approximate distinct users via the engine-portable
    HLL shared with `sketch_hll` (sketches.hll_group_stats: m=512
    registers, mergeable MAX-combine partial agg — constant memory per
    group vs the full dedup shuffle of exact distinct, the only viable
    per-group cardinality estimator at 100 TB). Spark's native
    `approx_count_distinct` (HLL++) has the same scale shape and is the
    zero-dependency production choice, but its register layout is not
    replayable by any other engine; this portable twin makes the
    estimate value-checkable cross-engine, not just error-bound-tested
    (the error-bound test remains: tests/test_maintenance.py).

    ONE scan, no join (r8): hll_group_stats folds the per-group row
    count into the register aggregation via a sentinel bucket, so the
    events scan — the dominant cost at 100 TB — happens once instead
    of twice-plus-a-join. Groups whose user_ids are ALL NULL surface
    with estimate 0 (the zero-occupancy linear-counting branch),
    matching the upstream approx_count_distinct contract; the oracle
    mirrors that via LEFT JOIN + COALESCE."""
    from log2ck_spark.queries.sketches import hll_group_stats

    ev = tbl(spark, sf_dir, "events")
    return hll_group_stats(ev, "event_type", "user_id").select(
        "event_type",
        F.round("est", 0).cast("bigint").alias("approx_users"),
        "n",
    )


@register(
    "distinct_exact",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


# --------------------------------------------------------------------------
# B15 window functions — rank / lag / running frames
# --------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT user_id, event_id, ts, value
    FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'error'
    ) WHERE rn = 1
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest error per user: one shuffle on user_id, per-partition
    sort, row_number. Deterministic via (ts, event_id) tie-break."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


@register(
    "window_lag",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
           CAST(epoch_us(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                AS DOUBLE) / 1000000.0 AS gap_s
    FROM events WHERE event_type = 'purchase'
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    prev_ts = F.lag("ts").over(w)
    gap_s = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).cast("double")
        / F.lit(1000000.0)
    ).alias("gap_s")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        gap_s,
    )


@register(
    "window_running",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) AS running_value
    FROM events WHERE event_type = 'click'
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").try_cast(DECIMAL)).over(w).cast("double").alias("running_value"),
        )
    )


# --------------------------------------------------------------------------
# Flagship star-schema queries (TPC-H-shaped; exercise B5-B9, B13 at once)
# --------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty}, {sum_base_price}, {sum_disc_price}, {sum_charge},
           {avg_qty}, {avg_price}, {avg_disc},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=oracle_dsum("l_quantity", "sum_qty"),
        sum_base_price=oracle_dsum("l_extendedprice", "sum_base_price"),
        sum_disc_price=oracle_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
        sum_charge=oracle_dsum(
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"
        ),
        avg_qty=oracle_davg("l_quantity", "avg_qty"),
        avg_price=oracle_davg("l_extendedprice", "avg_price"),
        avg_disc=oracle_davg("l_discount", "avg_disc"),
    ),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan, two-phase hash aggregate over a
    2-value x 3-value grouping — the partial aggregate reduces each scan
    partition to ≤6 rows before the shuffle."""
    l = tbl(spark, sf_dir, "lineitem", fanout=True).filter(
        F.col("l_shipdate") <= "1998-09-02 00:00:00"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           {revenue},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """.format(
        revenue=oracle_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    ),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k. The
    customer filter is applied before the join (Catalyst pushes it);
    lineitem⋈orders shuffles on orderkey once, then the aggregate reuses
    that partitioning (no second shuffle)."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "zorder_layout",
    oracle="""
    WITH dims AS (
      SELECT ((user_id % 65536) + 65536) % 65536 AS a,
             ((CAST(floor((epoch_us(ts) // 1000000) / 3600.0) AS BIGINT)
               % 65536) + 65536) % 65536 AS b
      FROM events
    ), keyed AS (
      SELECT a, b,
             (SELECT SUM(((a >> i) & 1) * (1::BIGINT << (2 * i))
                         + ((b >> i) & 1) * (1::BIGINT << (2 * i + 1)))
              FROM range(16) t(i)) AS zkey
      FROM dims
    )
    SELECT CAST(zkey // 16777216 AS BIGINT) AS z_bucket,
           COUNT(*) AS n,
           CAST(MIN(a) AS BIGINT) AS a_min, CAST(MAX(a) AS BIGINT) AS a_max,
           CAST(MIN(b) AS BIGINT) AS b_min, CAST(MAX(b) AS BIGINT) AS b_max
    FROM keyed GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, hour): the
    multi-dimension data-skipping layout — sorting by an interleaved-
    bit key keeps BOTH dimensions locally narrow in every file, so
    parquet min/max stats prune two-predicate queries that a plain
    `ORDER BY (a, b)` (B2) only prunes on its leading column. This is
    the published lakehouse OPTIMIZE ZORDER technique expressed as a
    plain column: 16+16 bits interleaved with exact integer
    arithmetic (32 shift/mask terms, codegen'd — identical in any
    engine; no UDF).

    The emitted table is the layout AUDIT: per top-byte z-bucket, the
    extents of both dimensions — narrow a_max-a_min AND b_max-b_min
    per bucket is precisely the property the skipping relies on.
    Writing the layout is then `sortWithinPartitions(zkey)` on the
    same expression (B2 machinery); at 100 TB the sort key costs a
    map-side expression, never a shuffle of its own."""
    ev = tbl(spark, sf_dir, "events").select(
        # pmod, not %: a z-cell coordinate must land in [0, 65536) or
        # the bit interleave below is meaningless — signed % keeps the
        # dividend's sign, so a pre-1970 hour index (negative epoch)
        # produced NEGATIVE cells whose "z-key" scattered instead of
        # clustering (found by the --timewarp gate). pmod wraps
        # negatives into the grid on both engines.
        F.pmod(F.col("user_id"), F.lit(65536)).alias("a"),
        F.pmod(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint"),
            F.lit(65536),
        ).alias("b"),
    )
    zkey = None
    for i in range(16):
        term = (F.shiftright("a", i) % 2).cast("bigint") * (2 ** (2 * i)) + (
            F.shiftright("b", i) % 2
        ).cast("bigint") * (2 ** (2 * i + 1))
        zkey = term if zkey is None else zkey + term
    return (
        ev.select("a", "b", zkey.alias("zkey"))
        .groupBy(F.floor(F.col("zkey") / 16777216).cast("bigint").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
    )
