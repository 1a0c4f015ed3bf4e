"""Dead-letter side output, ops listener, graceful stop-all."""

from __future__ import annotations

import time

from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
from log2ck_spark.streaming import OpsLogListener, run_ingest_stream, stop_all


def _wait(pred, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_stream_static_enrichment_join(spark, tmp_path):
    """stream_static_join's TRUE streaming execution: a rate-less file
    stream of events micro-batch-joins the broadcast customer dim and
    lands the aggregated enrichment in a memory sink."""
    from pyspark.sql import functions as F

    from log2ck_spark.io import tbl
    from log2ck_spark.queries.streamq import enrich_with_dim

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "evstream")
    tbl(spark, sf_dir, "events").limit(500).coalesce(1).write.parquet(src)
    dim = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        enrich_with_dim(stream, dim)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        expected = (
            enrich_with_dim(tbl(spark, sf_dir, "events").limit(0), dim).columns
        )

        def rows():
            return spark.sql("SELECT * FROM enriched").collect()

        assert _wait(lambda: len(rows()) > 0)
        got = rows()
        assert set(got[0].asDict()) == set(expected)
        # every batch row joined a real segment value
        assert all(r["c_mktsegment"] is not None and r["n"] > 0 for r in got)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_dead_letter_stream_and_listener(spark, tmp_path):
    listener = OpsLogListener(log_dir=str(tmp_path / "oplogs"), echo=False)
    spark.streams.addListener(listener)
    try:
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "app.log").write_text(
            "[2024-01-01 10:00:00] app.INFO: fine {} []\n"
            "GARBAGE LINE\n"
            "[2024-01-01 10:00:01] app.ERROR: also fine {} []\n"
            "another bad one\n"
        )
        config = EngineConfig(
            tails=[TailSpec(name="dl", path=str(logs / "*.log"))],
            sink=SinkConfig(path=str(tmp_path / "table")),
            checkpoint_root=str(tmp_path / "ckpt"),
            trigger_seconds=1,
        )
        main_q, dead_q = run_ingest_stream(
            spark, config, config.tails[0], with_dead_letter=True
        )

        def dead_count():
            try:
                return spark.read.parquet(
                    str(tmp_path / "table" / "_dead_letter")
                ).count()
            except Exception:
                return 0

        def main_count():
            try:
                return spark.read.parquet(config.sink.path).count()
            except Exception:
                return 0

        assert _wait(lambda: main_count() == 2 and dead_count() == 2), (
            main_count(),
            dead_count(),
        )
        dead_rows = {
            r["raw_line"]
            for r in spark.read.parquet(
                str(tmp_path / "table" / "_dead_letter")
            ).collect()
        }
        assert dead_rows == {"GARBAGE LINE", "another bad one"}

        # graceful stop of everything (A12)
        stop_all(spark)
        assert spark.streams.active == []

        # the ops listener wrote daily tab-separated lines (A14)
        import os

        logdir = tmp_path / "oplogs"
        assert _wait(lambda: logdir.exists() and len(os.listdir(logdir)) > 0, 10)
        some_file = next(iter(os.listdir(logdir)))
        content = (logdir / some_file).read_text()
        assert "\t" in content
    finally:
        spark.streams.removeListener(listener)


def test_stream_stream_interval_join_live(spark, tmp_path):
    """stream_stream_join's TRUE two-stream execution: clicks and
    errors arrive as separate readStream sources, both watermarked,
    and the event-time interval join runs in the state store. The
    emitted pair set must equal the batch analog over the same data."""
    from pyspark.sql import functions as F

    from log2ck_spark.io import tbl
    from log2ck_spark.queries.streamq import join_clicks_to_errors

    sf_dir = "/root/testdata/sf0.001"
    ev = tbl(spark, sf_dir, "events")
    c_src, e_src = str(tmp_path / "clicks"), str(tmp_path / "errors")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    clicks.coalesce(1).write.parquet(c_src)
    errors.coalesce(1).write.parquet(e_src)

    schema = spark.read.parquet(c_src).schema
    c_stream = spark.readStream.schema(schema).parquet(c_src).withWatermark(
        "ts", "1 hour"
    )
    e_stream = spark.readStream.schema(schema).parquet(e_src).withWatermark(
        "ts", "1 hour"
    )
    q = (
        join_clicks_to_errors(c_stream, e_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        expected = {
            tuple(r)
            for r in join_clicks_to_errors(clicks, errors).collect()
        }
        assert expected, "fixture produced no pairs — widen the window"

        def got():
            return {tuple(r) for r in spark.sql("SELECT * FROM ssj").collect()}

        assert _wait(lambda: got() == expected, timeout=90), (
            f"streaming join emitted {len(got())} pairs, want {len(expected)}"
        )
    finally:
        q.stop()
        q.awaitTermination(30)


def test_hll_registers_stream_incrementally(spark, tmp_path):
    """The HLL register table is a plain (groupBy, MAX) aggregation —
    it must run INCREMENTALLY under Structured Streaming (complete
    mode) and converge to exactly the batch registers. This is the
    mergeable-sketch property live: each micro-batch merges its
    registers into state by MAX, so a stream of 100 TB/day needs 512
    registers per group of state, not the history."""
    from pyspark.sql import functions as F

    from log2ck_spark.io import tbl

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "ev")
    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id")
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    ev.repartition(2).write.parquet(src)

    def registers(df):
        h = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        rest = F.shiftright(F.col("h"), 9).cast("bigint")
        rho = F.when(rest == 0, F.lit(52)).otherwise(
            52 - F.length(F.bin(rest))
        )
        return (
            df.select("event_type", h.alias("h"))
            .select("event_type", (F.col("h") % 512).alias("bucket"), rho.alias("r"))
            .groupBy("event_type", "bucket")
            .agg(F.max("r").alias("m_rho"))
        )

    expected = {tuple(r) for r in registers(spark.read.parquet(src)).collect()}
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        registers(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hllreg")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:

        def got():
            return {
                tuple(r) for r in spark.sql("SELECT * FROM hllreg").collect()
            }

        assert _wait(lambda: got() == expected, timeout=90), (
            f"streaming registers {len(got())} != batch {len(expected)}"
        )
    finally:
        q.stop()
        q.awaitTermination(30)


def test_session_window_stream_live(spark, tmp_path):
    """session_window's TRUE streaming execution (C5): a watermarked
    stream groups per-user sessions in the state store; the complete
    result equals the batch sessionize over the same data."""
    from log2ck_spark.queries.streamq import sessionize

    src = tmp_path / "sess"
    src.mkdir()
    # user 1: two sessions (gap 20 min > 5 min); user 2: one session
    rows = [
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 10:02:00", 1, 2.0),
        ("2024-01-01 10:22:00", 1, 3.0),
        ("2024-01-01 10:00:00", 2, 4.0),
    ]
    src.joinpath("p.json").write_text(
        "\n".join(
            f'{{"ts": "{ts}", "user_id": {u}, "value": {v}}}'
            for ts, u, v in rows
        )
    )
    schema = "ts timestamp, user_id bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        sessionize(stream, gap="5 minutes")
        .writeStream.format("memory")
        .queryName("sess_live")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        expected = {
            (r.session_start.isoformat(), r.user_id, r.n_events, r.sum_value)
            for r in sessionize(
                spark.read.schema(schema).json(str(src)), gap="5 minutes"
            ).collect()
        }
        assert len(expected) == 3  # 2 sessions for u1, 1 for u2

        def got():
            return {
                (r.session_start.isoformat(), r.user_id, r.n_events, r.sum_value)
                for r in spark.sql("select * from sess_live").collect()
            }

        assert _wait(lambda: got() == expected, timeout=90)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_stream_left_outer_join_emits_on_watermark_expiry(
    spark, tmp_path
):
    """The advanced stream-stream case: LEFT OUTER interval join.
    A click with no error within its 6 h horizon must emit with NULL
    error — but only once the (min-across-streams) watermark passes
    the horizon, because until then a matching error could still
    arrive. Batch 1: one matched click, one unmatched. Batch 2: far-
    future events on BOTH streams advance the watermark past the
    horizon, releasing the unmatched click."""
    import json as _json

    from pyspark.sql import functions as F

    from log2ck_spark.queries.streamq import join_clicks_to_errors

    c_src, e_src = tmp_path / "clicks", tmp_path / "errors"
    c_src.mkdir(), e_src.mkdir()

    def w(path, rows):
        path.write_text(
            "\n".join(
                _json.dumps({"ts": ts, "user_id": u, "event_id": i})
                for ts, u, i in rows
            )
        )

    w(c_src / "b1.json", [("2024-01-01 10:00:00", 1, 100),
                          ("2024-01-01 10:00:00", 2, 200)])
    w(e_src / "b1.json", [("2024-01-01 11:00:00", 1, 900)])

    schema = "ts timestamp, user_id bigint, event_id bigint"
    c_stream = (
        spark.readStream.schema(schema).json(str(c_src))
        .withWatermark("ts", "10 minutes")
    )
    e_stream = (
        spark.readStream.schema(schema).json(str(e_src))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        join_clicks_to_errors(c_stream, e_stream, how="leftOuter")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def got():
            return {
                (r.user_id, r.click_id, r.error_id, r.lag_s)
                for r in spark.sql("SELECT * FROM ssj_outer").collect()
            }

        # inner match emits promptly; the unmatched click must NOT
        assert _wait(lambda: (1, 100, 900, 3600) in got(), timeout=60)
        assert (2, 200, None, None) not in got()

        # watermark advance on BOTH streams (equal ts → no new pair)
        w(c_src / "b2.json", [("2024-01-02 10:00:00", 9, 101)])
        w(e_src / "b2.json", [("2024-01-02 10:00:00", 9, 901)])
        assert _wait(lambda: (2, 200, None, None) in got(), timeout=90)
    finally:
        q.stop()
        q.awaitTermination(30)
