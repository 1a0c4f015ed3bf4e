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


def test_run_encoder_closes_runs_across_batches(spark, tmp_path):
    """A run split across micro-batches must close as ONE run: batch 1
    ends with an open 'B' run; batch 2 extends it then changes state,
    which closes B with the carried count."""
    from log2ck_spark.streaming.stateful import run_intervals

    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            [
                '{"key": "u1", "state": "A", "ts_s": 1, "event_id": 1}',
                '{"key": "u1", "state": "A", "ts_s": 2, "event_id": 2}',
                '{"key": "u1", "state": "B", "ts_s": 3, "event_id": 3}',
            ]
        )
    )
    stream = spark.readStream.schema(
        "key string, state string, ts_s long, event_id long"
    ).json(str(src))
    q = (
        run_intervals(stream)
        .writeStream.format("memory")
        .queryName("runs_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                (r.key, r.run_id, r.state, r.n_events)
                for r in spark.sql("select * from runs_out").collect()
            }

        # batch 1: A-run closed when B arrived; B still open
        assert _wait(lambda: rows() == {("u1", 0, "A", 2)})
        (src / "b2.json").write_text(
            "\n".join(
                [
                    '{"key": "u1", "state": "B", "ts_s": 4, "event_id": 4}',
                    '{"key": "u1", "state": "C", "ts_s": 5, "event_id": 5}',
                ]
            )
        )
        # B extended across the batch boundary, then closed with n=2
        assert _wait(
            lambda: rows() == {("u1", 0, "A", 2), ("u1", 1, "B", 2)}
        )
    finally:
        q.stop()
        q.awaitTermination(30)
