"""Metric time-series operators over `events` — counter-rate with
reset handling, time-weighted averages, and a pivoted daily activity
matrix. This is the monitoring surface a log2ck/ClickHouse deployment
layers over its ingested table (the reference's DDL sorts by
`(created_at, repo, host)` exactly to serve per-entity time scans,
`/root/reference/readme.md:122`); the operator semantics follow the
published Prometheus/PromQL definitions (`rate()`/`increase()` with
counter-reset detection) re-expressed as single-shuffle window plans.

Determinism: the synthetic counter is integer arithmetic (floor of
value cents, cumulative-summed then wrapped), so both engines walk an
identical bigint sequence; time weights are integer seconds; weighted
sums go through the decimal cast chain (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import DECIMAL, finite, oracle_round6
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

_WRAP = 100_000  # counter wraps at 1e5 cents → several resets per user


@register(
    "rate_counter",
    oracle=f"""
    WITH samples AS (
      SELECT user_id, event_id,
             (epoch_us(ts) // 1000000) AS ts_s,
             -- non-finite gauge readings carry no increment, same as
             -- NULL ones (--nonfinite contract): DuckDB's CAST(nan AS
             -- BIGINT) raises outright, so guard before the floor
             CAST(floor(CASE WHEN isfinite(value) THEN value END * 100)
                  AS BIGINT) AS v_int
      FROM events
    ), counter AS (
      SELECT user_id, ts_s,
             SUM(v_int) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                              ROWS UNBOUNDED PRECEDING) % {_WRAP} AS c
      FROM samples
    ), deltas AS (
      SELECT user_id, ts_s, c,
             lag(c) OVER (PARTITION BY user_id ORDER BY ts_s, c) AS prev
      FROM counter
    )
    SELECT user_id, COUNT(*) AS n_samples,
           CAST(SUM(CASE WHEN prev IS NULL THEN 0
                         WHEN c >= prev THEN c - prev
                         ELSE c END) AS BIGINT) AS increase,
           MAX(ts_s) - MIN(ts_s) AS duration_s,
           ROUND(SUM(CASE WHEN prev IS NULL THEN 0
                          WHEN c >= prev THEN c - prev
                          ELSE c END)
                 / (MAX(ts_s) - MIN(ts_s)), 6) AS rate_per_s
    FROM deltas GROUP BY user_id
    HAVING MAX(ts_s) - MIN(ts_s) > 0
    """,
)
def rate_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style `increase()`/`rate()` with counter-reset detection:
    a wrap-around counter is sampled per user; a sample below its
    predecessor means the counter reset, so the full post-reset value
    counts as increase (the published Prometheus rule). The fixture
    synthesizes the counter deterministically (cumulative value-cents
    mod {w}) so both engines walk the identical bigint sequence.

    ONE shuffle on user_id serves the cumulative-sum window, the lag
    window, and the final per-user aggregation (same partitioning
    key); per-key state is a sort within the partition. At 100 TB of
    samples this is the canonical gauge/counter downsample shape —
    no driver state, no per-key collect, scales with key cardinality.

    The lag window orders by (ts_s, c): c is itself a deterministic
    function of the (ts_s, event_id) walk, so the delta sequence is
    reproducible even where timestamps tie."""
    ev = tbl(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        # non-finite readings → NULL increment, like NULL readings
        # (--nonfinite contract; mirrors the oracle's isfinite CASE)
        F.floor(F.when(finite("value"), F.col("value")) * 100)
        .cast("bigint")
        .alias("v_int"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counter = ev.select(
        "user_id", "ts_s", (F.sum("v_int").over(w_cum) % _WRAP).alias("c")
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts_s", "c")
    deltas = counter.withColumn("prev", F.lag("c").over(w_lag))
    inc = F.sum(
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("c") >= F.col("prev"), F.col("c") - F.col("prev"))
        .otherwise(F.col("c"))
    )
    dur = F.max("ts_s") - F.min("ts_s")
    return (
        deltas.groupBy("user_id")
        .agg(
            F.count("*").alias("n_samples"),
            inc.alias("increase"),
            dur.alias("duration_s"),
            F.round(inc / dur, 6).alias("rate_per_s"),
        )
        .filter(F.col("duration_s") > 0)
    )


rate_counter.__doc__ = rate_counter.__doc__.format(w=_WRAP)


@register(
    "time_weighted_avg",
    oracle="""
    WITH samples AS (
      SELECT user_id, value,
             (epoch_us(ts) // 1000000) AS ts_s,
             event_id
      FROM events
    ), weighted AS (
      SELECT user_id, value, ts_s,
             lead(ts_s) OVER (PARTITION BY user_id
                              ORDER BY ts_s, event_id) - ts_s AS w
      FROM samples
    )
    SELECT user_id,
           COUNT(*) AS n_samples,
           CAST(SUM(w) AS BIGINT) AS duration_s,
           ROUND(CAST(CAST(SUM(TRY_CAST(CAST(value * w AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                 / SUM(w), 6) AS twa
    FROM weighted
    WHERE w IS NOT NULL
    GROUP BY user_id
    HAVING SUM(w) > 0
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a sampled gauge: each sample holds its
    value until the next one (step interpolation), so its weight is
    the integer-second gap to its successor; the last sample of each
    key carries no weight. This is the standard irregular-series
    downsample (the `avg_over_time` analog for step gauges) — a plain
    AVG over irregular samples over-weights bursts.

    Same one-shuffle shape as rate_counter: the lead window and the
    per-user aggregation share the user_id exchange. The value×weight
    products go through the decimal cast chain so the sum is
    order-independent (functions/numeric.py); weights are exact
    integer seconds, so both engines aggregate identical decimals."""
    ev = tbl(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
    )
    w_lead = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    weighted = ev.withColumn(
        "w", F.lead("ts_s").over(w_lead) - F.col("ts_s")
    ).filter(F.col("w").isNotNull())
    wsum = F.sum((F.col("value") * F.col("w")).try_cast(DECIMAL)).cast("double")
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("w").alias("duration_s"),
            F.round(wsum / F.sum("w"), 6).alias("twa"),
        )
        .filter(F.col("duration_s") > 0)
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_daily_activity",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events GROUP BY 1
    """,
)
def pivot_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: one row per day, one count column per event
    type — the dashboard matrix every log deployment renders. Uses
    Spark's native `pivot` WITH the value list supplied explicitly:
    omitting it triggers an extra distinct-values job AND makes the
    output schema data-dependent — at 100 TB both are real costs, and
    a drifting schema breaks downstream consumers. With the list
    pinned, the compiled plan is two aggregation stages ((day, type)
    counts, then pivotfirst over day) — but BOTH exchanges move only
    aggregated rows (≤ days × 5), because the map-side partial
    collapses the corpus before the first shuffle; the raw events
    never shuffle."""
    ev = tbl(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot(...).count() yields NULL for a (day, type) cell with zero
    # events; the SQL COUNT(*) FILTER yields 0 — coalesce so a sparse
    # day matches the relational semantics.
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@register(
    "correlate_series",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             COUNT(*) FILTER (WHERE event_type = 'error') AS x,
             COUNT(*) FILTER (WHERE event_type = 'click') AS y
      FROM events GROUP BY 1
    ), moments AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM hourly
    )
    SELECT n AS n_hours,
           ROUND((n * sxy - sx * sy)
                 / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS corr,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                       / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
    FROM moments
    WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def correlate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS fit between two derived metric
    series (hourly error count vs hourly click count) — the
    do-errors-track-traffic question every log deployment asks. NOT
    `F.corr`: Spark's corr accumulates float co-moments whose partial
    order varies run-to-run, so it can't hash-match an oracle. Both
    series here are integer counts, so all five moments (Σx Σy Σxy
    Σx² Σy²) are EXACT bigint sums — the closed-form corr/slope/
    intercept is then one deterministic float expression per engine.

    Shape: one conditional-count agg per hour (partial-combined
    map-side; both series materialize in a single pass over events —
    no per-series scans, no join), then a single-row moment agg.
    The hour agg shuffles only |hours| rows; moments reduce those to
    one row. Works identically over any pair of derived series."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("y"),
    )
    m = hourly.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = n * F.col("sxy") - sx * sy
    var_x = n * F.col("sxx") - sx * sx
    var_y = n * F.col("syy") - sy * sy
    slope = cov_n.cast("double") / var_x
    # degenerate-frame guard: a single hour (or a constant series)
    # has zero variance — no correlation is defined; emit no row
    # rather than divide by zero (oracle mirrors the predicate)
    m = m.filter((n > 1) & (var_x > 0) & (var_y > 0))
    return m.select(
        n.alias("n_hours"),
        F.round(
            cov_n / F.sqrt(var_x.cast("double") * var_y), 6
        ).alias("corr"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "agg_latest_by_key",
    oracle="""
    SELECT user_id,
           latest.ts_s AS last_ts_s,
           latest.event_id AS last_event_id,
           latest.event_type AS last_event_type,
           latest.value AS last_value
    FROM (
      SELECT user_id,
             MAX({'ts_s': (epoch_us(ts) // 1000000),
                  'event_id': event_id,
                  'event_type': event_type,
                  'value': value}) AS latest
      FROM events GROUP BY user_id
    )
    """,
)
def agg_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest value per key — ClickHouse's `argMax(value, ts)` idiom,
    the single most common log-analytics reduction (current state per
    host/session/device from an append-only event table). Expressed
    as MAX over a (ts, event_id, payload) struct, NOT a row_number
    window: a window must shuffle EVERY row and sort every key's full
    history inside the exchange, while the struct-max is a
    partial-aggregable reduction — each mapper keeps one struct per
    key, the shuffle carries one row per (partition, key), and both
    engines compare structs lexicographically, so the unique event_id
    tiebreak makes the result deterministic. (Spark executes it as a
    partial SortAggregate, not a hash agg — struct-typed buffers are
    not hash-aggregable in 4.x, and neither are max_by or
    string/binary max, probed r13 — but the map-side sort reduces to
    one row per key BEFORE the exchange, which is the property that
    matters at 100 TB; the row_number window ships the entire corpus
    through the shuffle first.)"""
    ev = tbl(spark, sf_dir, "events")
    latest = F.max(
        F.struct(
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
        )
    )
    return (
        ev.groupBy("user_id")
        .agg(latest.alias("latest"))
        .select(
            "user_id",
            F.col("latest.ts_s").alias("last_ts_s"),
            F.col("latest.event_id").alias("last_event_id"),
            F.col("latest.event_type").alias("last_event_type"),
            F.col("latest.value").alias("last_value"),
        )
    )


@register(
    "iat_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) // 1000000)
               - lag((epoch_us(ts) // 1000000))
                 OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS gap_s
      FROM events
    )
    SELECT event_type,
           COUNT(gap_s) AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           ROUND(CAST(SUM(gap_s) AS DOUBLE) / COUNT(gap_s), 6) AS mean_gap_s,
           quantile_cont(gap_s, 0.95) AS p95_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def iat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event stream — the
    heartbeat/liveness profile (is the source steady, bursty, or
    stalling?) every ingestion deployment watches, and the basis for
    the reference's own EOF-poll/flush-timer tuning (A9's
    max_sent_wait is exactly a bet on arrival gaps, `Worker.php:122`).

    Gaps are exact integer seconds from a lag window; the stats are
    one agg on the same event_type partitioning (ONE shuffle total).
    p95 uses the exact interpolated percentile (Spark `percentile` ≡
    DuckDB `quantile_cont`, the verified pair from percentile_agg) —
    at 100 TB switch to approx_percentile, same plan shape."""
    ev = tbl(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("ts_s"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts_s", "event_id")
    gaps = ev.withColumn(
        "gap_s", F.col("ts_s") - F.lag("ts_s").over(w)
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.round(
            F.sum("gap_s").cast("double") / F.count("gap_s"), 6
        ).alias("mean_gap_s"),
        F.percentile("gap_s", 0.95).alias("p95_gap_s"),
    )


@register(
    "seasonal_hour_profile",
    oracle="""
    WITH hourly AS (
      SELECT event_type, hour(ts) AS hod,
             COUNT(*) AS n,
             SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS sv_dec
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(hod AS INTEGER) AS hod, n,
           {m} AS mean_value,
           {d} AS dev_from_daily_mean
    FROM hourly
    """.format(
        m=oracle_round6("CAST(CAST(sv_dec AS VARCHAR) AS DOUBLE) / n"),
        # the daily total stays in DECIMAL through the window sum —
        # summing the hourly DOUBLES is order-dependent and visibly so
        # once the sums reach 1e12 (r10 --bignum); only the final
        # already-exact totals convert to double (varchar route)
        d=oracle_round6(
            "CAST(CAST(sv_dec AS VARCHAR) AS DOUBLE) / n"
            " - CAST(CAST(SUM(sv_dec) OVER (PARTITION BY event_type)"
            "   AS VARCHAR) AS DOUBLE)"
            " / SUM(n) OVER (PARTITION BY event_type)"
        ),
    ),
)
def seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality baseline per metric: mean value in each
    of the 24 daily hours and its deviation from the overall mean —
    the profile that turns naive thresholds into time-of-day-aware
    ones (traffic at 3am ≠ traffic at noon; alerting against the
    seasonal baseline is the standard fix, and anomaly_zscore's
    per-type stats are exactly what this decomposes by hour).

    One conditional agg to ≤ |types|×24 rows (decimal sums for
    order-independence), then windows over that tiny frame. The same
    query shape extends to day-of-week or month profiles by swapping
    the bucket expression."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(
        F.count("*").alias("n"),
        # keep the hourly sum as DECIMAL: the daily total below re-sums
        # it in a window, and decimal addition is the only way that
        # second sum stays order-independent (double accumulation
        # drifts visibly at 1e12 magnitudes — r10 --bignum gate)
        F.sum(F.col("value").try_cast(DECIMAL)).alias("sv_dec"),
    )
    wt = Window.partitionBy("event_type")
    mean = F.col("sv_dec").cast("double") / F.col("n")
    daily = F.sum("sv_dec").over(wt).cast("double") / F.sum("n").over(wt)
    return hourly.select(
        "event_type",
        "hod",
        "n",
        F.round(mean, 6).alias("mean_value"),
        F.round(mean - daily, 6).alias("dev_from_daily_mean"),
    )


_REF_USER = 0  # similarity-search query series: user 0's daily counts


@register(
    "series_similarity_search",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, day(ts) AS d, COUNT(*) AS n FROM events GROUP BY 1, 2
    ), span AS (
      SELECT COUNT(DISTINCT day(ts)) AS nd FROM events
    ), ref AS (
      SELECT d, n AS rn FROM daily WHERE user_id = {_REF_USER}
    ), ref_m AS (
      SELECT CAST(SUM(rn) AS BIGINT) AS sy,
             CAST(SUM(rn * rn) AS BIGINT) AS syy
      FROM ref
    ), cand AS (
      SELECT da.user_id,
             CAST(SUM(da.n) AS BIGINT) AS sx,
             CAST(SUM(da.n * da.n) AS BIGINT) AS sxx,
             CAST(SUM(da.n * COALESCE(r.rn, 0)) AS BIGINT) AS sxy
      FROM daily da LEFT JOIN ref r USING (d)
      WHERE da.user_id <> {_REF_USER}
      GROUP BY 1
    )
    SELECT user_id,
           ROUND((span.nd * sxy - sx * sy)
                 / sqrt(CAST((span.nd * sxx - sx * sx) AS DOUBLE)
                        * (span.nd * syy - sy * sy)), 6) AS corr
    FROM cand, ref_m, span
    WHERE span.nd * sxx - sx * sx > 0 AND span.nd * syy - sy * sy > 0
    ORDER BY corr DESC, user_id LIMIT 10
    """,
)
def series_similarity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: which users' daily activity
    series correlate most with a reference user's — the
    whose-behavior-looks-like-this query (cf. the distributed
    time-series similarity search line in PAPERS.md, EDBT 2019/2020).
    Pearson over the DENSE day-aligned series, computed from SPARSE
    per-(user, day) counts: absent days are zeros, which contribute
    nothing to any Σ, so the sparse aggregates equal the dense ones
    with n = #days in span — no calendar densification, no per-pair
    series materialization.

    Shape: one (user, day) count agg; the reference series and its
    moments broadcast (≤ span rows); per-candidate moments are one
    more agg over the joined sparse counts; TakeOrdered emits the
    top-10. At 100 TB the cost is two aggregations of the event
    table — the same complexity as one groupBy, for a search across
    EVERY key's series."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.dayofmonth("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    # r13 (guide §2.4): the span used to COUNT DISTINCT day-of-month
    # over a second full events scan; every event's day is already a
    # group key of `daily`, so the same value is a distinct-count over
    # the (user, day) aggregate — runtime exchange reuse turns the
    # second corpus pass into a reduce of the existing one (plan: 2
    # events scans -> 1; countDistinct skips the NULL-day group on
    # both shapes).
    nd = daily.agg(F.countDistinct("d").alias("nd"))
    ref = daily.filter(F.col("user_id") == _REF_USER).select(
        "d", F.col("n").alias("rn")
    )
    ref_m = ref.agg(
        F.sum("rn").alias("sy"),
        F.sum(F.col("rn") * F.col("rn")).alias("syy"),
    )
    cand = (
        daily.filter(F.col("user_id") != _REF_USER)
        .join(F.broadcast(ref), "d", "left")
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("sx"),
            F.sum(F.col("n") * F.col("n")).alias("sxx"),
            F.sum(F.col("n") * F.coalesce(F.col("rn"), F.lit(0))).alias("sxy"),
        )
    )
    j = cand.crossJoin(F.broadcast(ref_m)).crossJoin(F.broadcast(nd))
    var_x = F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("nd") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        var_x.cast("double") * var_y
    )
    return (
        j.filter((var_x > 0) & (var_y > 0))
        .select("user_id", F.round(corr, 6).alias("corr"))
        .orderBy(F.desc("corr"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "forecast_features",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr,
           n,
           lag(n, 1) OVER w AS lag_1,
           lag(n, 24) OVER w AS lag_24,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY hr
                             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS sum_24h,
           CAST(hour(hr) AS INTEGER) AS hod,
           CAST(isodow(hr) AS INTEGER) AS dow
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    """,
)
def forecast_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-forecasting feature assembly: the hourly series per
    metric widened with its own lags (t-1, t-24), a rolling 24 h sum,
    and calendar features (hour-of-day, ISO day-of-week) — the
    standard autoregressive design matrix a gradient-boosted or
    linear forecaster trains on, built where the data lives. Lags are
    ROW-based over the observed hourly frame (missing hours simply
    don't exist as rows — same convention both engines).

    One corpus agg to the hourly frame; every feature window shares
    the event_type partitioning of that tiny frame. All features are
    exact integers; the hour key is emitted as a formatted string
    (cross-engine-stable timestamp round-trip)."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    w24 = w.rowsBetween(-23, 0)
    return hourly.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
        "n",
        F.lag("n", 1).over(w).alias("lag_1"),
        F.lag("n", 24).over(w).alias("lag_24"),
        F.sum("n").over(w24).cast("bigint").alias("sum_24h"),
        F.hour("hr").cast("int").alias("hod"),
        # ISO weekday (Mon=1..Sun=7) from Spark's Sun=1 dayofweek
        (((F.dayofweek("hr") + 5) % 7) + 1).cast("int").alias("dow"),
    )


@register(
    "forecast_eval",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), pred AS (
      SELECT event_type, n,
             lag(n, 24) OVER (PARTITION BY event_type ORDER BY hr) AS yhat
      FROM hourly
    )
    SELECT event_type,
           COUNT(yhat) AS n_scored,
           CAST(SUM(abs(n - yhat)) AS BIGINT) AS total_abs_err,
           ROUND(CAST(SUM(abs(n - yhat)) AS DOUBLE) / COUNT(yhat), 6)
             AS mae,
           ROUND(CAST(SUM(abs(n - yhat)) AS DOUBLE) / SUM(n) FILTER
                 (WHERE yhat IS NOT NULL), 6) AS wape
    FROM pred WHERE yhat IS NOT NULL
    GROUP BY event_type
    """,
)
def forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast baseline evaluation: the seasonal-naive predictor
    (ŷ(t) = n(t−24h)) scored per metric with MAE and WAPE — the
    benchmark every real forecaster must beat, and the denominator of
    'is the model worth running'. Pairs with forecast_features: one
    builds the design matrix, this one anchors the error floor.

    Errors are exact integer |n − ŷ| sums (no float accumulation);
    the lag window and the scoring agg share the event_type
    partitioning of the tiny hourly frame."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    pred = hourly.withColumn("yhat", F.lag("n", 24).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    abs_err = F.sum(F.abs(F.col("n") - F.col("yhat")))
    return pred.groupBy("event_type").agg(
        F.count("yhat").alias("n_scored"),
        abs_err.cast("bigint").alias("total_abs_err"),
        F.round(abs_err.cast("double") / F.count("yhat"), 6).alias("mae"),
        F.round(abs_err.cast("double") / F.sum("n"), 6).alias("wape"),
    )


@register(
    "delta_sum",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             (epoch_us(ts) // 1000000) AS ts_s,
             CAST(floor(CASE WHEN isfinite(value) THEN value END * 100)
                  AS BIGINT) AS v
      FROM events
      WHERE user_id IS NOT NULL
    ), obs AS (
      -- deltaSum skips NULL observations entirely (they do not break
      -- adjacency): drop them BEFORE the lag
      SELECT * FROM s WHERE v IS NOT NULL
    ), d AS (
      SELECT user_id,
             v - lag(v) OVER (PARTITION BY user_id
                              ORDER BY ts_s, event_id) AS dv
      FROM obs
    )
    SELECT user_id,
           COUNT(*) AS n_samples,
           CAST(COALESCE(SUM(CASE WHEN dv > 0 THEN dv END), 0)
                AS BIGINT) AS delta_sum
    FROM d GROUP BY user_id
    """,
)
def delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `deltaSum(value)` per user_id: the sum of POSITIVE
    differences between consecutive observations, negative deltas
    ignored outright. Distinct from rate_counter's PromQL rule — a
    drop there is a counter reset whose post-reset value counts; here
    a drop contributes nothing (CK's documented semantics, the shape
    used for monotone-ish gauges where dips are noise, not resets).
    Observations are integer cents of the finite values (the same
    deterministic quantization as rate_counter, --nonfinite/--bignum
    safe); NULL/non-finite observations are skipped without breaking
    adjacency, as the CK aggregate does.

    Kernel: ONE shuffle on user_id serves the lag window and the
    final per-user aggregation (same key); per-key state is a sort
    within the partition. CK evaluates deltaSum as streaming
    aggregate state over its ORDER BY; the lag-then-conditional-sum
    is that state machine expressed relationally — no per-key
    collect, scales with user cardinality at 100 TB."""
    obs = (
        tbl(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("ts_s"),
            F.floor(F.when(finite("value"), F.col("value")) * 100)
            .cast("bigint")
            .alias("v"),
        )
        .where(F.col("v").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    d = obs.select(
        "user_id", (F.col("v") - F.lag("v").over(w)).alias("dv")
    )
    return d.groupBy("user_id").agg(
        F.count("*").alias("n_samples"),
        F.coalesce(
            F.sum(F.when(F.col("dv") > 0, F.col("dv"))), F.lit(0)
        )
        .cast("long")
        .alias("delta_sum"),
    )
