"""Structured Streaming jobs — the reference's Manager/Worker runtime
(SURVEY.md §2 A1-A3, A9-A13) mapped onto engine primitives:

* offset checkpointing (A2, `Worker.php:62,162-177`) → checkpointLocation
* supervision/restart (A13, `Manager.php:29-47`) → restart-from-checkpoint
* dual-trigger micro-batching (A9, `Worker.php:119-129`) →
  trigger(processingTime) + maxFilesPerTrigger rate cap
* graceful shutdown (A12) → query.stop() after commit-log flush
* at-least-once insert-then-commit (A10, `Worker.php:123-124`) →
  exactly-once via offset/commit logs + idempotent batch files
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from log2ck_spark.config import EngineConfig, TailSpec
from log2ck_spark.pipeline import stream_pipeline
from log2ck_spark.sink import writer_for


def run_ingest_stream(
    spark: SparkSession,
    config: EngineConfig,
    tail: TailSpec,
    with_dead_letter: bool = False,
) -> StreamingQuery | tuple[StreamingQuery, StreamingQuery]:
    """One streaming query per tail (the reference's one-process-per-
    tail, `Manager.php:95-108`, without the processes).

    ``with_dead_letter=True`` additionally starts the A5 side output: a
    second query (own checkpoint) appending rejected raw lines to
    `<sink>/_dead_letter` — the engine-grade version of the reference's
    log-and-drop (`Worker.php:154-156`), since the rejects stay
    queryable."""
    rows, dead = stream_pipeline(spark, config, tail)
    sink = config.sink_for(tail)
    checkpoint = os.path.join(config.checkpoint_root, tail.name)
    writer = writer_for(sink)  # dispatch on sink.kind (A10/A11)
    main_q = (
        rows.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{config.trigger_seconds} seconds")
        .start()
    )
    if not with_dead_letter:
        return main_q
    dead_path = os.path.join(sink.path, "_dead_letter")
    dead_q = (
        dead.writeStream.format("parquet")
        .option("path", dead_path)
        .option("checkpointLocation", checkpoint + "-dead")
        .trigger(processingTime=f"{config.trigger_seconds} seconds")
        .start()
    )
    return main_q, dead_q


def stop_all(spark: SparkSession, timeout_s: int = 30) -> None:
    """Graceful shutdown of every active query (A12,
    `ToolsTraits.php:48-54`): stop() lets the in-flight micro-batch
    commit, so nothing replays on restart beyond the usual guarantees."""
    for q in spark.streams.active:
        q.stop()
    for q in spark.streams.active:
        q.awaitTermination(timeout_s)


def windowed_stream(
    lines_or_events: DataFrame,
    width: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling agg with watermark for late data (C5):
    COMPOSES queries.streamq.tumbling_agg after declaring the
    watermark, so the streaming plan and the oracle-checked batch
    query are literally the same aggregation — a second hand-written
    copy here once had to be kept in lockstep by eye. Watermark bounds
    state: windows older than max(event time) - watermark are
    finalized and evicted."""
    from log2ck_spark.queries.streamq import tumbling_agg

    return tumbling_agg(
        lines_or_events.withWatermark("ts", watermark), width
    )


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Stateful stream dedup (C6): dropDuplicatesWithinWatermark keeps
    per-key state only within the watermark horizon — bounded state at
    unbounded input."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
