"""Dual-trigger buffer (custom applyInPandasWithState operator)."""

from __future__ import annotations

import time

from log2ck_spark.streaming.stateful import dual_trigger_flush


def _wait(pred, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_dual_trigger_count_and_wait(spark, tmp_path):
    """Key 'bulk' exceeds max_count -> flushes with reason=count.
    Key 'trickle' has few rows -> flushes via wait/timeout."""
    src = tmp_path / "events"
    src.mkdir()
    lines = [f'{{"event_type": "bulk", "value": 1.0}}' for _ in range(25)]
    lines += ['{"event_type": "trickle", "value": 2.0}'] * 2
    (src / "p1.json").write_text("\n".join(lines))

    stream = spark.readStream.schema("event_type string, value double").json(
        str(src)
    )
    out = dual_trigger_flush(stream, max_count=10, max_wait_s=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("flushes")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert _wait(
            lambda: spark.sql(
                "select count(*) c from flushes where key='bulk'"
            ).collect()[0]["c"]
            >= 1
        )
        # trickle (2 rows < max_count) must flush via the time trigger
        assert _wait(
            lambda: spark.sql(
                "select count(*) c from flushes where key='trickle'"
            ).collect()[0]["c"]
            >= 1
        )
    finally:
        q.stop()
    rows = {r["key"]: r for r in spark.sql("select * from flushes").collect()}
    assert rows["bulk"]["n_rows"] == 25 and rows["bulk"]["reason"] == "count"
    assert rows["trickle"]["n_rows"] == 2
    assert rows["trickle"]["reason"] in ("timeout", "wait")
    assert rows["trickle"]["sum_value"] == 4.0


def test_ewma_state_persists_across_batches(spark, tmp_path):
    """The forecast must carry across micro-batches: batch 1 seeds
    z=10 for key 'm'; batch 2's spike (100) must alert against the
    carried state, and the final snapshot reflects ALL events."""
    from log2ck_spark.streaming.stateful import ewma_alerts

    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join('{"event_type": "m", "value": 10.0}' for _ in range(3))
    )

    stream = spark.readStream.schema("event_type string, value double").json(
        str(src)
    )
    out = ewma_alerts(stream, alpha=0.2, threshold=25.0)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_snap")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert _wait(
            lambda: spark.sql(
                "select max(n_events) c from ewma_snap"
            ).collect()[0]["c"]
            == 3
        )
        # steady stream at 10 -> no alerts yet, forecast == 10
        row = spark.sql(
            "select * from ewma_snap where n_events = 3"
        ).collect()[0]
        assert row["n_alerts"] == 0 and abs(row["ewma"] - 10.0) < 1e-9

        (src / "b2.json").write_text('{"event_type": "m", "value": 100.0}')
        assert _wait(
            lambda: spark.sql(
                "select max(n_events) c from ewma_snap"
            ).collect()[0]["c"]
            == 4
        )
        row = spark.sql(
            "select * from ewma_snap where n_events = 4"
        ).collect()[0]
        # |100 - 10| >= 25 alerts against the CARRIED state
        assert row["n_alerts"] == 1
        assert abs(row["ewma"] - (0.2 * 100.0 + 0.8 * 10.0)) < 1e-9
    finally:
        q.stop()
