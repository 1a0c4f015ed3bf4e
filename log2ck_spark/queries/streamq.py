"""Event-time windowing + stateful dedup (SURVEY.md §2 C5/C6) — batch
analogs over `events` (identical window semantics batch/stream; the
true streaming execution with watermarks/checkpoints is exercised in
tests/test_streaming.py via the same helper functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import oracle_dsum, dsum
from log2ck_spark.io import tbl
from log2ck_spark.queries import register


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window agg — shared by the batch query below
    and the streaming job in log2ck_spark.streaming."""
    win = F.window(F.col("ts"), width)
    return (
        events.groupBy(win.alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 600) * 600000000 AS BIGINT)) AS win_start,
           make_timestamp(CAST((floor(epoch(ts) / 600) + 1) * 600000000 AS BIGINT)) AS win_end,
           event_type,
           COUNT(*) AS n,
           {sum_value}
    FROM events
    GROUP BY 1, 2, 3
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event_type. In streaming this
    same plan runs incrementally with a watermark bounding state; the
    oracle reproduces Spark's window start = floor(epoch/width)."""
    return tumbling_agg(tbl(spark, sf_dir, "events"))


def sessionize(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user: session_window closes a session when
    the gap to the next event is >= `gap` (half-open interval)."""
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      -- the running SUM must order by the SAME (ts, event_id) key the
      -- LAG flags were computed over: ordering by ts alone leaves tied
      -- timestamps at a session boundary free to sort before their
      -- new_session flag, landing one twin in the previous session
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT MIN(ts) AS session_start, user_id,
           COUNT(*) AS n_events, {sum_value}
    FROM numbered GROUP BY user_id, session_no
    """.format(sum_value=oracle_dsum("value", "sum_value")),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (5-min gap) per user — Spark's native session
    operator; the oracle derives identical sessions with the classic
    gaps-and-islands SQL."""
    return sessionize(tbl(spark, sf_dir, "events"))


def enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins
    against the (broadcast) static dimension — Spark re-reads the dim
    per batch, so a slowly-changing dim is picked up without restarts.
    Used by both the batch query below and the streaming test."""
    return (
        events.join(F.broadcast(dim), events.user_id % 25 == dim.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n, {sum_value}
    FROM events e JOIN customer c ON e.user_id % 25 = c.c_custkey
    GROUP BY 1, 2
    """.format(sum_value=oracle_dsum("e.value", "sum_value")),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (the streaming-ingest analog of A8's
    literal enrichment, but against a lookup TABLE): micro-batches
    broadcast-join a dimension, then window/agg as usual. Batch analog
    here (identical plan semantics); the true readStream execution is
    exercised in tests/test_streaming_extras.py. The surrogate join
    key (user_id % 25) maps fixture users onto customer keys."""
    ev = tbl(spark, sf_dir, "events")
    dim = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return enrich_with_dim(ev, dim)


@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id,
           MIN(ts) AS first_ts, COUNT(*) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of dropDuplicatesWithinWatermark on key
    (user_id, event_type): canonical first event per key. The streaming
    variant (bounded state via watermark) runs in tests."""
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.min("ts").alias("first_ts"),
            F.count("*").alias("n_dups"),
        )
    )


# --------------------------------------------------------------------------
# Stream-stream interval join (C5 family: the two-stream correlation)
# --------------------------------------------------------------------------

_SSJ_WINDOW_S = 6 * 3600  # errors correlate to clicks up to 6 h earlier


def join_clicks_to_errors(
    clicks: DataFrame, errors: DataFrame, how: str = "inner"
) -> DataFrame:
    """Event-time interval join: each click pairs with the same user's
    errors landing in (click_ts, click_ts + 6 h]. Shared by the batch
    query below and the true stream-stream execution in
    tests/test_streaming_extras.py (where both sides carry watermarks
    and the range condition bounds the join state the engine keeps).

    The join key is (user_id) equality + an event-time range — in
    streaming, Spark derives the state-eviction horizon from exactly
    this condition; in batch it is a plain SMJ on user_id with the
    range as a post-join predicate. Emitting integer-second lag keeps
    the output engine-portable."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    joined = c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (
            F.col("error_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {_SSJ_WINDOW_S} SECONDS")
        ),
        how,
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "error_id",
        (
            F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_s"),
    )


@register(
    "stream_stream_join",
    oracle=f"""
    SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
           (epoch_us(e.ts) // 1000000)
             - (epoch_us(c.ts) // 1000000) AS lag_s
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND e.ts > c.ts
     AND e.ts <= c.ts + INTERVAL {_SSJ_WINDOW_S} SECOND
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the stream-stream inner interval join: which
    errors followed each click within 6 h, per user — the two-stream
    correlation primitive (click/impression attribution, cause→effect
    log joins). The true streaming run (watermarks on both sides,
    bounded join state) is exercised in tests/test_streaming_extras.py
    via the same join helper.

    Scale shape: an equi-join on user_id with the time range as a
    join-level predicate — broadcast-hash when a filtered side fits
    (what AQE picks at fixture scale), sort-merge with one exchange
    per side otherwise; never a cartesian. In streaming the same
    condition caps state at
    (per-user clicks within the 6 h horizon), so a 100 TB/day pair of
    streams holds hours, not history, in the state store."""
    ev = tbl(spark, sf_dir, "events")
    return join_clicks_to_errors(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
    )
