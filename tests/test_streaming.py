"""Structured Streaming tests — the reference's runtime semantics
(A1/A2/A5/A9/A10/A12) executed for real: file source, checkpointed
foreachBatch sink, watermarked windows, stateful dedup, restart/resume.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec
from log2ck_spark.streaming import dedup_stream, run_ingest_stream, windowed_stream


def _write_log(path, day, start, n):
    lines = "\n".join(
        f"[{day} 10:00:{i:02d}] app.INFO: m{start + i} {{}} []" for i in range(n)
    )
    path.write_text(lines + "\n")


def _wait(predicate, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.5)
    return False


def test_ingest_stream_end_to_end_and_resume(spark, tmp_path):
    """File source → parse → enrich → partitioned parquet sink via
    foreachBatch with checkpoint; then a 'rotation': a new file appears
    and is picked up without restart (A1/A3); then stop + restart the
    query from the same checkpoint (A2/A13) — no duplicates."""
    logs = tmp_path / "logs"
    logs.mkdir()
    _write_log(logs / "app-2024-01-01.log", "2024-01-01", 0, 5)
    config = EngineConfig(
        tails=[TailSpec(name="t1", path=str(logs / "app-*.log"), repo="r1")],
        sink=SinkConfig(path=str(tmp_path / "table")),
        checkpoint_root=str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    query = run_ingest_stream(spark, config, config.tails[0])

    def table_count():
        try:
            return spark.read.parquet(config.sink.path).count()
        except Exception:
            return 0

    assert _wait(lambda: table_count() == 5), f"got {table_count()}"
    # rotation: next day's file appears while the query runs
    _write_log(logs / "app-2024-01-02.log", "2024-01-02", 100, 3)
    assert _wait(lambda: table_count() == 8), f"got {table_count()}"
    query.stop()  # graceful shutdown (A12)
    query.awaitTermination(30)

    # restart from checkpoint: already-committed files are not replayed
    query2 = run_ingest_stream(spark, config, config.tails[0])
    _write_log(logs / "app-2024-01-03.log", "2024-01-03", 200, 2)
    assert _wait(lambda: table_count() == 10), f"got {table_count()}"
    query2.stop()
    query2.awaitTermination(30)

    table = spark.read.parquet(config.sink.path)
    assert table.select("message").distinct().count() == 10  # exactly-once
    assert {r["repo"] for r in table.select("repo").distinct().collect()} == {"r1"}
    assert table.select("log_date").distinct().count() == 3  # partitioned


def test_windowed_stream_with_watermark(spark, tmp_path):
    """Event-time tumbling agg with watermark over a streamed source,
    checked against the batch analog on the same data (C5)."""
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        (f"2024-01-01 10:{m:02d}:00", "error", float(m)) for m in range(0, 30, 3)
    ]
    src.joinpath("part1.json").write_text(
        "\n".join(
            f'{{"ts": "{ts}", "event_type": "{et}", "value": {v}}}'
            for ts, et, v in rows
        )
    )
    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    out = windowed_stream(stream, width="10 minutes", watermark="1 hour")
    query = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    assert _wait(
        lambda: spark.sql("select * from win_test").count() == 3, timeout=60
    )
    query.stop()
    got = {
        r["win_start"].isoformat(): (r["n"], r["sum_value"])
        for r in spark.sql("select * from win_test").collect()
    }
    batch = windowed_stream  # same fn works on batch too? use streamq analog
    from log2ck_spark.queries.streamq import tumbling_agg

    expected = {
        r["win_start"].isoformat(): (r["n"], r["sum_value"])
        for r in tumbling_agg(
            spark.read.schema(schema).json(str(src)), "10 minutes"
        ).collect()
    }
    assert got == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops the duplicate key arriving
    within the horizon (C6)."""
    src = tmp_path / "dup_events"
    src.mkdir()
    src.joinpath("p.json").write_text(
        "\n".join(
            [
                '{"ts": "2024-01-01 10:00:00", "k": "a", "v": 1}',
                '{"ts": "2024-01-01 10:00:10", "k": "a", "v": 2}',
                '{"ts": "2024-01-01 10:00:20", "k": "b", "v": 3}',
            ]
        )
    )
    stream = spark.readStream.schema("ts timestamp, k string, v int").json(str(src))
    query = (
        dedup_stream(stream, ["k"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    assert _wait(lambda: spark.sql("select * from dedup_test").count() >= 2)
    query.stop()
    got = spark.sql("select k from dedup_test").collect()
    assert sorted(r["k"] for r in got) == ["a", "b"]
