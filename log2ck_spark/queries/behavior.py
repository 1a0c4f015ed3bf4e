"""Behavioral log analytics over `events` — sessionization, funnel
conversion, and cohort retention. These are the queries a log2ck/
ClickHouse deployment runs over the ingested event table (the
reference's `ORDER BY (created_at, repo, host)` layout exists exactly
to serve this neighbor-analytics family, `readme.md:122`), expressed
as window + aggregation plans.

Determinism: every window orders by (ts, event_id) so ties can't
reorder across engines or partitionings; durations are integer
seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import DECIMAL, finite
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

_GAP_S = 1800  # 30-minute inactivity ends a session


@register(
    "sessionize_gap",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             -- numeric.oracle_epoch_s: BIGINT // truncates toward
             -- zero exactly like Spark's unix_timestamp (floor is
             -- one low for pre-1970 fractional instants — --timewarp)
             (epoch_us(ts) // 1000000) AS ts_s
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts_s,
             CASE WHEN ts_s - lag(ts_s) OVER w > {_GAP_S}
                  OR lag(ts_s) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), sessions AS (
      SELECT user_id, ts_s,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts_s, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_idx
      FROM flagged
    )
    SELECT user_id, CAST(sess_idx AS INTEGER) AS sess_idx,
           COUNT(*) AS n_events,
           MAX(ts_s) - MIN(ts_s) AS duration_s
    FROM sessions GROUP BY user_id, sess_idx
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the lag-flag /
    running-sum pattern — the batch analog of `stream_session_window`.
    ONE shuffle on user_id serves both windows and the final per-
    session aggregation (same partitioning key); per-user state is a
    sort within the partition, so a 10^12-event table sessionizes in
    a single exchange."""
    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ts_s") - F.lag("ts_s").over(w) > _GAP_S)
            | F.lag("ts_s").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "sess_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy(
        "user_id", F.col("sess_idx").cast("int").alias("sess_idx")
    ).agg(
        F.count("*").alias("n_events"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_click_after,
           (SELECT COUNT(*) FROM s3) AS n_purchase_after
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: users counted at each
    stage only if the stage event happened strictly AFTER their
    previous stage entry. Each stage is min-timestamp aggregate +
    semi-filtered re-join — all three shuffles share the user_id key,
    and each stage's survivor set only shrinks, so the deepest joins
    are the cheapest. The stage frontier (user, t_k) is two columns
    per surviving user — broadcastable far into the funnel at scale."""
    ev = tbl(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .join(s2.agg(F.count("*").alias("n_click_after")))
        .join(s3.agg(F.count("*").alias("n_purchase_after")))
    )


@register(
    "retention_cohort",
    oracle="""
    WITH firstw AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
      FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((date_part('epoch', act_week)
                 - date_part('epoch', cohort_week)) / 604800 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_users
    FROM active JOIN firstw USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted in every later week they were active. The (user, week)
    distinct projection collapses the event table before any join —
    the join and both aggregations then operate on at most
    users × weeks rows. Offsets are exact integer arithmetic on
    week-truncated epochs. Cohort week emitted as a formatted string
    (cross-engine-stable date round-trip)."""
    ev = tbl(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    offset = (
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        active.join(firstw, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Z-score anomaly detection (per-type outlier events)
# --------------------------------------------------------------------------

_Z_THRESHOLD = 2.5


@register(
    "anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS mean,
             sqrt(greatest(
               (CAST(CAST(SUM(TRY_CAST(CAST(value * value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                - pow(CAST(CAST(SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE), 2)
                  / COUNT(*))
               / (COUNT(*) - 1), 0.0)) AS std
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mean) / s.std, 6) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.n > 1 AND s.std > 0
      AND abs((e.value - s.mean) / s.std) >= {_Z_THRESHOLD}
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: flag events whose value deviates
    >= {z} sample standard deviations from their type's mean — the
    metric-anomaly primitive of log analytics (the reference's own
    domain: its ClickHouse tables exist to answer exactly this kind of
    question over shipped logs, readme.md:106-125).

    Two-pass shape that stays two SCANS, one tiny shuffle: the
    per-type stats (decimal-exact Σx/Σx², same derivation as
    stats_moments) aggregate to |event_types| rows, broadcast back,
    and the outlier test is a codegen'd per-row predicate on the
    second scan. No window over the corpus — an `avg().over(type)`
    window would shuffle every event by a low-cardinality key
    (skew); the broadcast join shuffles nothing but the stats."""
    ev = tbl(spark, sf_dir, "events")
    s = F.sum(F.col("value").try_cast(DECIMAL)).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).try_cast(DECIMAL)).cast("double")
    n = F.count("*")
    var = (s2 - F.pow(s, 2) / n) / (n - 1)
    stats = ev.groupBy("event_type").agg(
        n.alias("n"),
        (s / n).alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("n") > 1) & (F.col("std") > 0))
        .filter(F.abs(z) >= _Z_THRESHOLD)
        .select(
            "event_id", "event_type", "value", F.round(z, 6).alias("z")
        )
    )


# --------------------------------------------------------------------------
# EWMA forecast deviation (per-key sequential state)
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.2  # paired with 0.8 below as an explicit literal: in
# IEEE doubles 1 - 0.2 != 0.8, and the oracle's recursion uses the
# 0.8 literal — both engines must run the identical recurrence.
_EWMA_THRESHOLD = 25.0


@register(
    "anomaly_ewma",
    oracle=f"""
    WITH RECURSIVE ord AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      -- observations = FINITE values (--nonfinite contract): one NaN
      -- poisons z for the rest of the user's walk, and Inf deltas
      -- make abs(x - z) comparisons engine-ambiguous — skip them like
      -- the NULLs this filter already skipped
      FROM events WHERE isfinite(value) AND ts IS NOT NULL
    ), rec AS (
      SELECT user_id, rn, value AS z, 0 AS n_alerts FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn,
             {_EWMA_ALPHA} * o.value + 0.8 * r.z AS z,
             r.n_alerts + CASE WHEN abs(o.value - r.z) >= {_EWMA_THRESHOLD}
                               THEN 1 ELSE 0 END
      FROM rec r JOIN ord o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id, CAST(rn AS BIGINT) AS n_events,
           ROUND(z, 6) AS ewma, CAST(n_alerts AS BIGINT) AS n_alerts
    FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM rec)
    WHERE rn = mx
    """,
)
def anomaly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA forecast deviation: walk each user's events in
    (ts, event_id) order, maintain z = 0.2*x + 0.8*z, and count the
    events deviating >= {t} from the running forecast — the smoothed
    per-entity alerting the reference's log tables feed, and the batch
    analog of streaming/stateful.ewma_update (same recurrence, state
    checkpointed by the engine there).

    An EWMA is a sequential recurrence — the one shape plain window
    functions can't express (a closed-form pow() rewrite overflows for
    long histories). This is the documented (b) path, with one twist:
    grouping applyInPandas BY USER pays the per-group Arrow/pandas
    machinery once per user (measured 4.3 s at sf0.1, ~3 ms x 1500
    groups); grouping by a hash BUCKET of users instead amortizes that
    to #buckets calls, with an in-batch pandas groupby walking each
    user's slice (0.6 s, same output). Buckets scale with cores; users
    within a bucket are sequential, which is fine because users >>
    cores. The DuckDB oracle replays the identical recurrence as a
    recursive CTE — the float ops are literal-for-literal the same, so
    results match bit-for-bit before the final rounding."""
    import numpy as np
    import pandas as pd

    ev = (
        tbl(spark, sf_dir, "events")
        # finite observations only (--nonfinite; mirrors the oracle)
        .filter(finite("value") & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.pmod(F.hash("user_id"), F.lit(64)).alias("bucket"),
        )
    )

    def _ewma_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        out = []
        for uid, g in pdf.groupby("user_id", sort=False):
            x = g["value"].to_numpy(dtype=np.float64)
            z = x[0]
            n_alerts = 0
            for v in x[1:]:
                if abs(v - z) >= _EWMA_THRESHOLD:
                    n_alerts += 1
                z = _EWMA_ALPHA * v + 0.8 * z
            out.append((int(uid), len(x), round(z, 6), n_alerts))
        return pd.DataFrame(
            out, columns=["user_id", "n_events", "ewma", "n_alerts"]
        )

    return (
        ev.groupBy("bucket")
        .applyInPandas(
            _ewma_bucket,
            "user_id bigint, n_events bigint, ewma double, n_alerts bigint",
        )
    )


# --------------------------------------------------------------------------
# Distribution drift (PSI between time periods)
# --------------------------------------------------------------------------

_PSI_BIN = 25.0  # value-bin width


@register(
    "drift_psi",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             CAST(floor(value / {_PSI_BIN}) AS BIGINT) AS bin,
             COUNT(*) FILTER (WHERE day(ts) <= 15) AS cnt_a,
             COUNT(*) FILTER (WHERE day(ts) > 15) AS cnt_b
      -- a distribution has no bin for NaN/±Inf (DuckDB's CAST even
      -- raises on them) — observations are the finite values on both
      -- engines (--nonfinite contract)
      FROM events WHERE isfinite(value) GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, bin, cnt_a, cnt_b,
             SUM(cnt_a) OVER (PARTITION BY event_type) AS n_a,
             SUM(cnt_b) OVER (PARTITION BY event_type) AS n_b
      FROM binned
    ), terms AS (
      SELECT event_type, n_a, n_b,
             ROUND((CAST(cnt_a AS DOUBLE) / n_a
                    - CAST(cnt_b AS DOUBLE) / n_b)
                   * ln((CAST(cnt_a AS DOUBLE) / n_a)
                        / (CAST(cnt_b AS DOUBLE) / n_b)), 9) AS term
      FROM tot WHERE cnt_a > 0 AND cnt_b > 0
    )
    SELECT event_type,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           COUNT(*) AS n_bins_used,
           ROUND(CAST(CAST(SUM(TRY_CAST(CAST(term AS VARCHAR) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE), 6) AS psi
    FROM terms GROUP BY event_type
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the first
    and second half of the month — the standard production check that
    a feature/metric distribution has drifted (PSI < 0.1 stable,
    > 0.25 drifted). For a training-data pipeline this is the
    ingest-time gate that catches a source whose content shifted
    before it poisons a mixture.

    Determinism: bins and period counts are exact integers computed
    in ONE conditional-count pass (no per-period scans); each bin's
    PSI term is rounded to 1e-9 then decimal-summed — the
    doc_perplexity pattern that makes a float Σ over bins order- and
    engine-independent. Bins empty in either period are excluded
    (the standard finite-PSI convention, applied identically in both
    engines). One (type, bin) shuffle of pre-combined counts; the
    windows and final agg run on ≤ |types|×bins rows."""
    ev = tbl(spark, sf_dir, "events").where(finite("value"))
    binned = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / _PSI_BIN).cast("bigint").alias("bin"),
    ).agg(
        F.count(F.when(F.dayofmonth("ts") <= 15, 1)).alias("cnt_a"),
        F.count(F.when(F.dayofmonth("ts") > 15, 1)).alias("cnt_b"),
    )
    from pyspark.sql import Window as _W

    wt = _W.partitionBy("event_type")
    tot = binned.select(
        "*",
        F.sum("cnt_a").over(wt).alias("n_a"),
        F.sum("cnt_b").over(wt).alias("n_b"),
    ).filter((F.col("cnt_a") > 0) & (F.col("cnt_b") > 0))
    pa = F.col("cnt_a").cast("double") / F.col("n_a")
    pb = F.col("cnt_b").cast("double") / F.col("n_b")
    terms = tot.select(
        "event_type",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), 9).alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.count("*").alias("n_bins_used"),
        F.round(
            F.sum(F.col("term").try_cast("decimal(18,9)")).cast("double"), 6
        ).alias("psi"),
    )


@register(
    "runs_encode",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, event_id, ts,
             (epoch_us(ts) // 1000000) AS ts_s,
             CASE WHEN event_type IS DISTINCT FROM
                       lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type, ts_s,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           COUNT(*) AS n_events,
           CAST(MIN(ts_s) AS BIGINT) AS from_s,
           CAST(MAX(ts_s) AS BIGINT) AS to_s
    FROM runs GROUP BY 1, 2, 3
    """,
)
def runs_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's event stream: consecutive
    same-type events collapse into one (type, from, to, count)
    interval — the value-change flavor of gaps-and-islands
    (sessionize_gap is the time-gap flavor; this one is the SCD-2 /
    state-history builder: 'what was each entity's state, and when
    did it change'). Compressing state streams to their change
    points is also the training-data answer to redundant telemetry.

    Same one-exchange discipline as the other entity windows: the
    change-flag lag, the running-sum run numbering, and the final
    per-run aggregation all share the user_id partitioning. Output
    size is the number of STATE CHANGES, not events — on a 100 TB
    telemetry table with slowly-changing states that is orders of
    magnitude smaller than the input."""
    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    # Order runs by TRUE event time (full microsecond ts, event_id
    # tiebreak), not by the second-truncated ts_s the output reports:
    # two state flips within one second must still encode as two runs
    # in flip order. The ts_s-ordered variant also disagreed with the
    # full-ts lag under truncation collisions (--timewarp gate).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
    ).otherwise(0)
    runs = ev.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy(
        "user_id", F.col("run_id").cast("bigint").alias("run_id"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts_s").alias("from_s"),
        F.max("ts_s").alias("to_s"),
    )


@register(
    "alert_pipeline",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, COUNT(*) AS n_hours,
             CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean,
             sqrt(greatest(
               (CAST(SUM(n * n) AS DOUBLE)
                - pow(CAST(SUM(n) AS DOUBLE), 2) / COUNT(*))
               / (COUNT(*) - 1), 0.0)) AS std
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type,
           CAST(s.n_hours AS BIGINT) AS n_hours,
           ROUND(s.mean, 6) AS mean_per_hour,
           ROUND(s.std, 6) AS std_per_hour,
           CAST(COUNT(*) FILTER (
             WHERE abs(h.n - s.mean) >= 2 * s.std) AS BIGINT) AS n_alert_hours,
           ROUND(MAX(abs(h.n - s.mean) / s.std), 6) AS max_abs_z
    FROM hourly h JOIN stats s USING (event_type)
    WHERE s.n_hours > 1 AND s.std > 0
    GROUP BY 1, 2, 3, 4
    """,
)
def alert_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end monitoring flow as ONE composed plan — the
    log-analytics twin of curate_pipeline's composition story:
    hourly downsample (agg_time_bucket's shape) → per-type volume
    baseline (anomaly_zscore's decimal-exact moments, here over the
    HOURLY frame so the alert unit is an hour of traffic, not one
    event) → 2σ alert-hour count and worst excursion per type.
    This is the query a deployment schedules: 'which streams had
    abnormal hours today, and how abnormal'.

    Shape: the only corpus-wide stage is the (type, hour) count agg
    (partial-combined); stats aggregate the ≤ |types|×hours frame
    and broadcast back onto it. Hourly counts are exact integers, so
    mean/std/z are the same IEEE expressions in both engines."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    n = F.count("*")
    s1 = F.sum("n").cast("double")
    s2 = F.sum(F.col("n") * F.col("n")).cast("double")
    var = (s2 - F.pow(s1, 2) / n) / (n - 1)
    stats = hourly.groupBy("event_type").agg(
        n.alias("n_hours"),
        (s1 / n).alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    )
    z = F.abs(F.col("n") - F.col("mean")) / F.col("std")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("n_hours") > 1) & (F.col("std") > 0))
        .groupBy(
            "event_type",
            F.col("n_hours").cast("bigint").alias("n_hours"),
            F.round("mean", 6).alias("mean_per_hour"),
            F.round("std", 6).alias("std_per_hour"),
        )
        .agg(
            # literal-for-literal the oracle's predicate (abs(n-mean)
            # >= 2*std, NOT z >= 2): the two are algebraically equal
            # but are different float expressions, and a boundary hour
            # could land on opposite sides by one ULP
            F.count(
                F.when(
                    F.abs(F.col("n") - F.col("mean")) >= 2 * F.col("std"), 1
                )
            )
            .cast("bigint")
            .alias("n_alert_hours"),
            F.round(F.max(z), 6).alias("max_abs_z"),
        )
    )


_FUNNEL_W_US = 6 * 3600 * 1_000_000  # windowFunnel window: 6 hours


@register(
    "window_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view','click','purchase')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    r1 AS (
      SELECT *, MAX(CASE WHEN event_type='view' THEN us END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run1
      FROM e
    ),
    r2 AS (
      SELECT *, MAX(CASE WHEN event_type='click'
                          AND run1 >= us - {_FUNNEL_W_US}
                         THEN run1 END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run2
      FROM r1
    ),
    lv AS (
      SELECT user_id, MAX(CASE
         WHEN event_type='purchase' AND run2 >= us - {_FUNNEL_W_US} THEN 3
         WHEN event_type='click' AND run1 >= us - {_FUNNEL_W_US} THEN 2
         WHEN event_type='view' THEN 1 ELSE 0 END) AS level
      FROM r2 GROUP BY user_id
    )
    SELECT CAST(level AS INTEGER) AS level, COUNT(*) AS n_users
    FROM lv GROUP BY level ORDER BY level
    """,
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `windowFunnel(W)(ts, type='view', 'click',
    'purchase')` — the max funnel level each user reaches where every
    chain event falls within W of the chain's FIRST event — then the
    user histogram per level. This is the signature CK behavioral
    aggregate a log2ck deployment would run over the ingested events
    (the reference delegates its whole query surface to CK,
    readme.md:106-125).

    Spark-first re-expression — NOT the imperative per-user scan CK
    uses: level-k reachability folds into k-1 chained RUNNING MAXES
    over one (user_id, ts) sort. run1 = latest view time so far; a
    click within W of run1 reaches level 2 carrying chain start run1;
    run2 = the latest (= always optimal, since a later start only
    widens the remaining window) level-2 chain start; a purchase
    within W of run2 reaches level 3. Exactly the existential
    semantics "∃ v ≤ c ≤ p, p ≤ v + W" — one exchange, one sort, no
    per-user UDF, no event×event join; scales as O(n log n) per
    partition at any corpus size.

    Pinned contracts (both engines): tie-INCLUSIVE chains via RANGE
    frames (CK's own default mode is insertion-order-dependent for
    equal timestamps — not reproducible cross-engine); NULL ts or
    user_id rows can't join a chain and are filtered symmetrically.
    """
    w_us = F.lit(_FUNNEL_W_US)
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click", "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r1 = e.withColumn(
        "run1",
        F.max(
            F.when(F.col("event_type") == "view", F.col("us"))
        ).over(win),
    )
    r2 = r1.withColumn(
        "run2",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("run1") >= F.col("us") - w_us),
                F.col("run1"),
            )
        ).over(win),
    )
    lv = r2.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("run2") >= F.col("us") - w_us),
                F.lit(3),
            )
            .when(
                (F.col("event_type") == "click")
                & (F.col("run1") >= F.col("us") - w_us),
                F.lit(2),
            )
            .when(F.col("event_type") == "view", F.lit(1))
            .otherwise(F.lit(0))
        ).alias("level")
    )
    return (
        lv.groupBy(F.col("level").cast("int").alias("level"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("level")
    )


@register(
    "sequence_count",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
      WHERE event_type IN ('view','click')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    l AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id
             ) AS prev
      FROM e
    )
    SELECT user_id,
           COUNT(*) FILTER (
             WHERE event_type = 'click' AND prev = 'view'
           ) AS n_chains
    FROM l GROUP BY user_id
    """,
)
def sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceCount('(?1).*(?2)')(ts, view, click)` —
    NON-OVERLAPPING view→click chains per user, greedy left-to-right
    matching (CK's documented algorithm: once a chain closes, its
    events can't be reused).

    The greedy count collapses to a LAG: restrict to the two stage
    types, sort per user by (ts, event_id), and count clicks whose
    immediately-preceding stage event is a view — exactly the number
    of view-block→click-block alternations, which is what greedy
    non-overlap matches. One exchange, one sort, no state machine.
    Total order (ts, event_id) pins equal-timestamp behavior on both
    engines."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"), "event_id",
        )
    )
    win = Window.partitionBy("user_id").orderBy("us", "event_id")
    l = e.withColumn("prev", F.lag("event_type").over(win))
    return l.groupBy("user_id").agg(
        F.count(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("prev") == "view"),
                True,
            )
        ).alias("n_chains")
    )


@register(
    "retention_flags",
    oracle="""
    WITH u AS (
      SELECT user_id,
             BOOL_OR(event_type = 'signup') AS r1,
             BOOL_OR(event_type = 'click') AS c2,
             BOOL_OR(event_type = 'purchase') AS c3
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE r1) AS n_signup,
           COUNT(*) FILTER (WHERE r1 AND c2) AS n_signup_and_click,
           COUNT(*) FILTER (WHERE r1 AND c3) AS n_signup_and_purchase
    FROM u
    """,
)
def retention_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `retention(signup, click, purchase)` — per user the
    flag array [cond1, cond1 AND cond2, cond1 AND cond3] (conditions
    2..N only count when the FIRST condition held, per the CK
    definition — order-free, unlike the funnel), summed into the
    classic retention report. One hash aggregation on user_id, then a
    single-row reduce of three partial-aggregable counts."""
    ev = tbl(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.max(F.col("event_type") == "signup").alias("r1"),
        F.max(F.col("event_type") == "click").alias("c2"),
        F.max(F.col("event_type") == "purchase").alias("c3"),
    )
    return u.agg(
        F.count(F.when(F.col("r1"), True)).alias("n_signup"),
        F.count(F.when(F.col("r1") & F.col("c2"), True)).alias(
            "n_signup_and_click"
        ),
        F.count(F.when(F.col("r1") & F.col("c3"), True)).alias(
            "n_signup_and_purchase"
        ),
    )


@register(
    "sequence_match",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('signup','click','purchase')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    r1 AS (
      SELECT *, MAX(CASE WHEN event_type='signup' THEN us END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run1
      FROM e
    ),
    r2 AS (
      SELECT *, MAX(CASE WHEN event_type='click' AND run1 IS NOT NULL
                         THEN run1 END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run2
      FROM r1
    )
    SELECT user_id,
           BOOL_OR(event_type='purchase' AND run2 IS NOT NULL)
             AS matched
    FROM r2 GROUP BY user_id
    """,
)
def sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceMatch('(?1).*(?2).*(?3)')(ts, signup,
    click, purchase)` — per user, does the event stream contain the
    three conditions in timestamp order (any events in between, no
    time bound)? The unwindowed sibling of `window_funnel`, using the
    same chained-running-max kernel with the window check removed:
    run1 = any signup so far, run2 = any signup→click prefix so far,
    matched = a purchase after such a prefix. One exchange, no
    per-user state machine. Ties are chain-INCLUSIVE (RANGE frames),
    the same pinned contract as window_funnel; users with none of the
    three stage events do not appear (they have no row to match)."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("signup", "click", "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r1 = e.withColumn(
        "run1",
        F.max(
            F.when(F.col("event_type") == "signup", F.col("us"))
        ).over(win),
    )
    r2 = r1.withColumn(
        "run2",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("run1").isNotNull(),
                F.col("run1"),
            )
        ).over(win),
    )
    return r2.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase")
            & F.col("run2").isNotNull()
        ).alias("matched")
    )


@register(
    "window_funnel_strict_order",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    l AS (
      SELECT *,
        LAG(event_type)    OVER w AS p1_type,
        LAG(us)            OVER w AS p1_us,
        LAG(event_type, 2) OVER w AS p2_type,
        LAG(us, 2)         OVER w AS p2_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    lv AS (
      SELECT user_id, MAX(CASE
        WHEN event_type='purchase' AND p1_type='click'
             AND p2_type='view' AND us <= p2_us + {_FUNNEL_W_US} THEN 3
        WHEN event_type='click' AND p1_type='view'
             AND us <= p1_us + {_FUNNEL_W_US} THEN 2
        WHEN event_type='view' THEN 1 ELSE 0 END) AS level
      FROM l GROUP BY user_id
    )
    SELECT CAST(level AS INTEGER) AS level, COUNT(*) AS n_users
    FROM lv GROUP BY level ORDER BY level
    """,
)
def window_funnel_strict_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse `windowFunnel(W, 'strict_order')(ts, view, click,
    purchase)` — the strict_order mode: ANY other event between chain
    steps kills the chain ("in the case of A->B->D->C, it stops
    finding A->B->C at the D", the CK docs' own example), so a chain
    is exactly a run of CONSECUTIVE rows view,click,purchase in the
    user's FULL event stream (no event-type filter — an 'error' or
    'signup' between steps interrupts, matching CK, where rows
    matching no condition still advance the stream).

    Consecutiveness turns the funnel into two LAGs over one
    (user_id; ts, event_id) sort: level 3 = a purchase whose two
    immediate predecessors are click then view with the purchase
    within W of the view (the intermediate click is then within W
    automatically); level 2 = a click immediately after a view within
    W; level 1 = any view. One exchange, one sort, no per-user state
    machine — the strict mode is CHEAPER than the default funnel's
    chained running maxes. Equal timestamps are pinned by the total
    order (ts, event_id) on both engines (CK itself is
    insertion-order-dependent there — not reproducible)."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"), "event_id",
        )
    )
    win = Window.partitionBy("user_id").orderBy("us", "event_id")
    l = (
        e.withColumn("p1_type", F.lag("event_type").over(win))
        .withColumn("p1_us", F.lag("us").over(win))
        .withColumn("p2_type", F.lag("event_type", 2).over(win))
        .withColumn("p2_us", F.lag("us", 2).over(win))
    )
    w_us = F.lit(_FUNNEL_W_US)
    lv = l.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("p1_type") == "click")
                & (F.col("p2_type") == "view")
                & (F.col("us") <= F.col("p2_us") + w_us),
                F.lit(3),
            )
            .when(
                (F.col("event_type") == "click")
                & (F.col("p1_type") == "view")
                & (F.col("us") <= F.col("p1_us") + w_us),
                F.lit(2),
            )
            .when(F.col("event_type") == "view", F.lit(1))
            .otherwise(F.lit(0))
        ).alias("level")
    )
    return (
        lv.groupBy(F.col("level").cast("int").alias("level"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("level")
    )


@register(
    "window_funnel_strict_dedup",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
      WHERE event_type IN ('view','click','purchase')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    p1 AS (
      SELECT *,
        LAST_VALUE(CASE WHEN event_type IN ('view','click')
                        THEN struct_pack(t := event_type, u := us)
                   END IGNORE NULLS) OVER w AS pv
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p2 AS (
      SELECT *,
        CASE WHEN event_type='click' AND pv.t='view'
              AND us <= pv.u + {_FUNNEL_W_US} THEN pv.u END AS c2s,
        LAST_VALUE(CASE WHEN event_type IN ('view','click')
                        THEN struct_pack(
                          t := event_type,
                          s := CASE WHEN event_type='click'
                                     AND pv.t='view'
                                     AND us <= pv.u + {_FUNNEL_W_US}
                                    THEN pv.u END)
                   END IGNORE NULLS) OVER w AS pc
      FROM p1
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    lv AS (
      SELECT user_id, MAX(CASE
        WHEN event_type='purchase' AND pc.t='click'
             AND pc.s IS NOT NULL
             AND us <= pc.s + {_FUNNEL_W_US} THEN 3
        WHEN c2s IS NOT NULL THEN 2
        WHEN event_type='view' THEN 1 ELSE 0 END) AS level
      FROM p2 GROUP BY user_id
    )
    SELECT CAST(level AS INTEGER) AS level, COUNT(*) AS n_users
    FROM lv GROUP BY level ORDER BY level
    """,
)
def window_funnel_strict_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse `windowFunnel(W, 'strict_deduplication')(ts, view,
    click, purchase)` — a repeat of a condition the chain has ALREADY
    matched interrupts further processing (docs: "if the same
    condition holds for the sequence of events, then such repeating
    event interrupts further processing"), while events matching no
    not-yet-held condition pass through (only the three stage types
    feed the aggregate, matching the default funnel's framing).

    The interruption collapses declaratively: a surviving level-2
    chain's click must have a VIEW as its nearest preceding
    view-or-click (a nearer view restarts the chain later = strictly
    more window slack, a nearer click is the dedup kill), and a
    surviving level-3 purchase must have a QUALIFYING CLICK as ITS
    nearest preceding view-or-click (any view or click between kills
    — a view repeats condition 1, a click repeats condition 2;
    purchases between don't interrupt and the earlier purchase would
    itself complete the chain). So: one last-non-null window carrying
    (type, us) of the previous stage-1/2 event, a second carrying the
    click's chain start, then the level CASE — two window passes over
    the SAME (user_id; ts, event_id) sort = one exchange, one sort,
    no per-user state machine. Window checks anchor to the chain's
    first event (the view), per the CK contract; ties pinned by the
    total order (ts, event_id) on both engines."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click", "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"), "event_id",
        )
    )
    w_us = F.lit(_FUNNEL_W_US)
    win = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_vc = F.col("event_type").isin("view", "click")
    p1 = e.withColumn(
        "pv",
        F.last(
            F.when(
                is_vc,
                F.struct(
                    F.col("event_type").alias("t"),
                    F.col("us").alias("u"),
                ),
            ),
            ignorenulls=True,
        ).over(win),
    )
    c2s = F.when(
        (F.col("event_type") == "click")
        & (F.col("pv.t") == "view")
        & (F.col("us") <= F.col("pv.u") + w_us),
        F.col("pv.u"),
    )
    p2 = p1.withColumn("c2s", c2s).withColumn(
        "pc",
        F.last(
            F.when(
                is_vc,
                F.struct(
                    F.col("event_type").alias("t"),
                    c2s.alias("s"),
                ),
            ),
            ignorenulls=True,
        ).over(win),
    )
    lv = p2.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("pc.t") == "click")
                & F.col("pc.s").isNotNull()
                & (F.col("us") <= F.col("pc.s") + w_us),
                F.lit(3),
            )
            .when(F.col("c2s").isNotNull(), F.lit(2))
            .when(F.col("event_type") == "view", F.lit(1))
            .otherwise(F.lit(0))
        ).alias("level")
    )
    return (
        lv.groupBy(F.col("level").cast("int").alias("level"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("level")
    )


_SEQ_T_US = 3600 * 1_000_000  # sequenceMatch (?t<=N): 1 hour


@register(
    "sequence_match_time",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
      WHERE event_type IN ('signup','click')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    l AS (
      SELECT user_id, event_type, us,
             LAG(event_type) OVER w AS prev,
             LAG(us) OVER w AS prev_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT user_id,
           BOOL_OR(event_type='click' AND prev='signup'
                   AND us <= prev_us + {_SEQ_T_US}) AS matched
    FROM l GROUP BY user_id
    """,
)
def sequence_match_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceMatch('(?1)(?t<=3600)(?2)')(ts, signup,
    click)` — the time-bounded adjacent-step pattern: per user, does
    a click DIRECTLY follow a signup (among condition-matching
    events; rows matching no condition are ignored, per the CK
    contract) within 1 hour? The `(?t<=N)` operator constrains the
    gap between the two ADJACENT matched conditions — unlike
    `sequence_match`'s `.*` pattern there is no "any events between",
    so the kernel is a single LAG over the (user_id; ts, event_id)
    sort of the two stage types: matched = any click whose
    predecessor is a signup at most N seconds older. One exchange,
    no state machine; ties pinned by the total order, NULL ts/user
    filtered symmetrically on both engines."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("signup", "click")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"), "event_id",
        )
    )
    win = Window.partitionBy("user_id").orderBy("us", "event_id")
    l = e.withColumn("prev", F.lag("event_type").over(win)).withColumn(
        "prev_us", F.lag("us").over(win)
    )
    return l.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "click")
            & (F.col("prev") == "signup")
            & (F.col("us") <= F.col("prev_us") + F.lit(_SEQ_T_US))
        ).alias("matched")
    )


@register(
    "window_funnel_strict_increase",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view','click','purchase')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    r1 AS (
      SELECT *, MAX(CASE WHEN event_type='view' THEN us END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run1
      FROM e
    ),
    r2 AS (
      SELECT *, MAX(CASE WHEN event_type='click'
                          AND run1 >= us - {_FUNNEL_W_US}
                         THEN run1 END)
        OVER (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run2
      FROM r1
    ),
    lv AS (
      SELECT user_id, MAX(CASE
         WHEN event_type='purchase' AND run2 >= us - {_FUNNEL_W_US} THEN 3
         WHEN event_type='click' AND run1 >= us - {_FUNNEL_W_US} THEN 2
         WHEN event_type='view' THEN 1 ELSE 0 END) AS level
      FROM r2 GROUP BY user_id
    )
    SELECT CAST(level AS INTEGER) AS level, COUNT(*) AS n_users
    FROM lv GROUP BY level ORDER BY level
    """,
)
def window_funnel_strict_increase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse `windowFunnel(W, 'strict_increase')(ts, view, click,
    purchase)` — the third and last documented mode: chain steps must
    have STRICTLY increasing timestamps, so equal-timestamp events can
    never chain (the inverse of the default kernel's tie-INCLUSIVE
    RANGE frames). Completes the mode family with `window_funnel`
    (default), `window_funnel_strict_order`, and
    `window_funnel_strict_dedup`.

    Same chained-running-max kernel as the default funnel, with the
    frame tightened from CURRENT ROW to 1 PRECEDING on the
    microsecond ORDER BY — a RANGE frame bound, so "1 preceding"
    means us-1, i.e. STRICTLY earlier instants, independent of how
    many events share the current timestamp. One exchange, one sort,
    no per-user state machine; ties need no (ts, event_id) pin
    because the value-based frame excludes them symmetrically on both
    engines."""
    w_us = F.lit(_FUNNEL_W_US)
    e = (
        tbl(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click", "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    r1 = e.withColumn(
        "run1",
        F.max(
            F.when(F.col("event_type") == "view", F.col("us"))
        ).over(win),
    )
    r2 = r1.withColumn(
        "run2",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("run1") >= F.col("us") - w_us),
                F.col("run1"),
            )
        ).over(win),
    )
    lv = r2.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("run2") >= F.col("us") - w_us),
                F.lit(3),
            )
            .when(
                (F.col("event_type") == "click")
                & (F.col("run1") >= F.col("us") - w_us),
                F.lit(2),
            )
            .when(F.col("event_type") == "view", F.lit(1))
            .otherwise(F.lit(0))
        ).alias("level")
    )
    return (
        lv.groupBy(F.col("level").cast("int").alias("level"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("level")
    )


@register(
    "sequence_next_node",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    l AS (
      SELECT user_id, event_type, us, event_id,
             LAG(event_type) OVER w AS prev,
             LEAD(event_type) OVER w AS nxt
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    m AS (
      SELECT user_id, nxt,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY us, event_id
             ) AS rn
      FROM l
      WHERE event_type = 'click' AND prev = 'view'
    )
    SELECT user_id, nxt AS next_node FROM m WHERE rn = 1
    """,
)
def sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `sequenceNextNode('forward', 'first_match')(ts,
    event_type, ..., event_type='view', event_type='click')` — the
    event FOLLOWING the first matched view→click chain, per user (the
    "what do users do after converting?" dashboard query, from the
    same CK docs section as the windowFunnel family). Chain steps are
    adjacent in the user's FULL stream (sequenceNextNode evaluates
    every row, like strict_order; an interloper between view and
    click means no match there), `first_match` picks the earliest
    chain, and the node after the stream's last event is NULL.

    Kernel: one (user_id; ts, event_id) sort serving LAG (chain
    adjacency), LEAD (the next node), and ROW_NUMBER (first match) —
    three window functions, ONE exchange, no per-user state machine.
    Ties pinned by the total order on both engines."""
    e = (
        tbl(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("us"), "event_id",
        )
    )
    win = Window.partitionBy("user_id").orderBy("us", "event_id")
    l = (
        e.withColumn("prev", F.lag("event_type").over(win))
        .withColumn("nxt", F.lead("event_type").over(win))
    )
    m = l.where(
        (F.col("event_type") == "click") & (F.col("prev") == "view")
    ).withColumn("rn", F.row_number().over(win))
    return m.where(F.col("rn") == 1).select(
        "user_id", F.col("nxt").alias("next_node")
    )


_UNIQ_UP_TO_N = 8


@register(
    "uniq_up_to",
    oracle=f"""
    SELECT event_type,
           LEAST(COUNT(DISTINCT user_id), {_UNIQ_UP_TO_N} + 1)
             AS u_upto,
           COUNT(*) AS n_events
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `uniqUpTo(N)(user_id)` per event_type: the exact
    distinct count when it is ≤ N, else N+1 — CK's cheap "are there
    more than N distinct?" probe (the docs recommend it for small N
    where full uniqExact state is wasted). Spark's partial aggregation
    gives the same early-bound benefit structurally: the map-side
    distinct-set per (event_type, user_id) pair collapses before the
    exchange, and the final LEAST caps the answer — semantics parity
    with the CK function, expressed as exact-distinct + cap (NULL
    user_ids excluded, as uniqUpTo skips NULLs)."""
    return (
        tbl(spark, sf_dir, "events")
        .where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.least(
                F.count_distinct(F.col("user_id")),
                F.lit(_UNIQ_UP_TO_N + 1).cast("long"),
            ).alias("u_upto"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "max_intersections",
    oracle="""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s_us,
             epoch_us(ts) + 1000000 + CAST(FLOOR(fmod(abs(
               CASE WHEN isfinite(value) THEN value ELSE 0 END
             ), 6000.0) * 100000.0) AS BIGINT) AS e_us
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), pts AS (
      SELECT event_type, s_us AS t,  1 AS d FROM iv
      UNION ALL
      SELECT event_type, e_us AS t, -1 AS d FROM iv
    ), sweep AS (
      SELECT event_type, t,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t) AS o
      FROM pts
    ), mx AS (
      SELECT event_type, t, o,
             MAX(o) OVER (PARTITION BY event_type) AS m
      FROM sweep
    )
    SELECT event_type,
           CAST(MAX(o) AS BIGINT) AS max_open,
           MIN(CASE WHEN o = m THEN t END) AS pos_us
    FROM mx GROUP BY event_type
    """,
)
def max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `maxIntersections(start, end)` +
    `maxIntersectionsPosition` per event_type: the peak number of
    concurrently-open intervals and the earliest instant it is
    reached — "max concurrent sessions", the classic ops question CK
    answers with this aggregate pair. Intervals are synthesized
    deterministically from the fixture: [ts, ts + 1s + value-derived
    duration (≤ 10 min)], the duration via double fmod so both
    engines walk bit-identical arithmetic (non-finite/NULL value →
    zero extra, mirroring rate_counter's --nonfinite contract).

    Kernel: the sweep-line as ONE exchange — explode each interval
    into a (+1 at start, -1 at end) point row, cumulative-sum over a
    window partitioned by event_type, and take the running max. The
    default RANGE frame makes instants that tie process all their
    peers together (a touching end+start nets to zero), so the
    result is independent of physical row order on both engines. The
    per-partition MAX window and the final groupBy reuse the same
    partitioning key, so the whole plan is a single shuffle; at
    100 TB it scales with |event_type| × points per partition, no
    per-interval pair expansion, no driver state. CK computes the
    same quantity by sorting (point, ±1) pairs inside the aggregate
    state; the sweep is that algorithm expressed relationally."""
    ev = (
        tbl(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.unix_micros("ts").alias("s_us"),
            (
                F.unix_micros("ts")
                + F.lit(1_000_000)
                + F.floor(
                    (
                        F.abs(
                            F.when(finite("value"), F.col("value"))
                            .otherwise(F.lit(0.0))
                        )
                        % F.lit(6000.0)
                    )
                    * F.lit(100000.0)
                ).cast("bigint")
            ).alias("e_us"),
        )
    )
    # ONE scan: each interval row explodes into its two sweep points
    # (a unionAll of two selects would read the source twice — at
    # 100 TB that doubles the I/O for no plan benefit)
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("t"), F.lit(1).alias("d")),
                F.struct(
                    F.col("e_us").alias("t"), F.lit(-1).alias("d")
                ),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.d")
    # default frame with an ORDER BY = RANGE UNBOUNDED PRECEDING ..
    # CURRENT ROW: peers (tied instants) aggregate together — the
    # property that makes the sweep order-independent
    w_cum = Window.partitionBy("event_type").orderBy("t")
    sweep = pts.select(
        "event_type", "t", F.sum("d").over(w_cum).alias("o")
    )
    w_all = Window.partitionBy("event_type")
    mx = sweep.withColumn("m", F.max("o").over(w_all))
    return mx.groupBy("event_type").agg(
        F.max("o").cast("long").alias("max_open"),
        F.min(F.when(F.col("o") == F.col("m"), F.col("t"))).alias(
            "pos_us"
        ),
    )


@register(
    "interval_length_sum",
    oracle="""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s_us,
             epoch_us(ts) + 1000000 + CAST(FLOOR(fmod(abs(
               CASE WHEN isfinite(value) THEN value ELSE 0 END
             ), 6000.0) * 100000.0) AS BIGINT) AS e_us
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), pts AS (
      SELECT event_type, s_us AS t,  1 AS d FROM iv
      UNION ALL
      SELECT event_type, e_us AS t, -1 AS d FROM iv
    ), sweep AS (
      SELECT event_type, t,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t) AS o,
             lead(t) OVER (PARTITION BY event_type ORDER BY t) AS nt
      FROM pts
    )
    SELECT event_type,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(COALESCE(SUM(CASE WHEN o > 0 AND nt IS NOT NULL
                                  THEN nt - t END), 0)
                AS BIGINT) AS covered_us
    FROM sweep GROUP BY event_type
    """,
)
def interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `intervalLengthSum(start, end)` per event_type: the
    total length of the UNION of intervals — overlapping stretches
    counted once ("how long was at least one session open?").
    Interval synthesis is byte-identical to `max_intersections`
    (same [ts, ts + 1s + value-derived duration] family), so the two
    aggregates answer the paired CK questions over one dataset.

    Kernel: the same one-exchange sweep — +1/-1 point rows, a
    peer-netting RANGE cumsum for the open count — plus a LEAD on the
    identical sort for the next sweep instant; a covered segment
    [t_i, t_{i+1}) contributes exactly once because among tied rows
    at t_i only the sort-final peer's LEAD reaches the next distinct
    instant (every other peer's LEAD is its own t: a zero-length
    term), making the sum independent of physical tie order on both
    engines. CK computes this by sorting the (point, ±1) pairs inside
    its aggregate state; this is that algorithm relationally, one
    shuffle, no pair expansion, integer microseconds throughout."""
    ev = (
        tbl(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.unix_micros("ts").alias("s_us"),
            (
                F.unix_micros("ts")
                + F.lit(1_000_000)
                + F.floor(
                    (
                        F.abs(
                            F.when(finite("value"), F.col("value"))
                            .otherwise(F.lit(0.0))
                        )
                        % F.lit(6000.0)
                    )
                    * F.lit(100000.0)
                ).cast("bigint")
            ).alias("e_us"),
        )
    )
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("t"), F.lit(1).alias("d")),
                F.struct(
                    F.col("e_us").alias("t"), F.lit(-1).alias("d")
                ),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.d")
    w = Window.partitionBy("event_type").orderBy("t")
    sweep = pts.select(
        "event_type",
        "t",
        F.sum("d").over(w).alias("o"),
        F.lead("t").over(w).alias("nt"),
    )
    return sweep.groupBy("event_type").agg(
        (F.count("*") / 2).cast("long").alias("n_intervals"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("o") > 0) & F.col("nt").isNotNull(),
                    F.col("nt") - F.col("t"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("covered_us"),
    )
