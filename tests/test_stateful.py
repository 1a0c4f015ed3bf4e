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


class _FakeState:
    """Minimal GroupState stand-in for driving the pandas fns directly."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_flusher_arms_remaining_wait_not_full_window():
    """The dual-trigger contract is 'flush when age > max_sent_wait';
    re-arming the FULL window on every batch that touches the key let
    a late second event push the first event's flush out to ~2x the
    window (A at t=0, B at t=9, 10s window -> timeout re-armed to
    t=19). The timeout must be the REMAINING time from first_seen."""
    import pandas as pd

    from log2ck_spark.streaming.stateful import make_flusher

    fn = make_flusher(max_count=100, max_wait_s=10.0)
    st = _FakeState()
    # first event: buffered, timeout armed at (close to) the full 10s
    list(fn(("k",), [pd.DataFrame({"value": [1.0]})], st))
    assert st.exists and 9_000 < st.timeout_ms <= 10_000
    # simulate 9s of age by back-dating first_seen, then a second event
    import time as _t

    n, total, first_seen = st.get
    st.update((n, total, _t.time() - 9.0))
    list(fn(("k",), [pd.DataFrame({"value": [1.0]})], st))
    # remaining ~1s, NOT re-armed to 10s
    assert st.exists and 0 < st.timeout_ms <= 1_100


def test_run_encoder_sorts_across_arrow_chunks():
    """A key larger than the Arrow batch size arrives as MULTIPLE
    pandas chunks; sorting each independently re-splits runs at every
    chunk boundary where order straddles it. One sort over the whole
    micro-batch: rows [A(ts=1), A(ts=3)] + [A(ts=2), B(ts=4)] must
    encode as ONE closed A-run of 3, not A/A fragments."""
    import pandas as pd

    from log2ck_spark.streaming.stateful import make_run_encoder

    fn = make_run_encoder()
    st = _FakeState()
    chunk1 = pd.DataFrame(
        {"state": ["A", "A"], "ts_s": [1, 3], "event_id": [1, 3]}
    )
    chunk2 = pd.DataFrame(
        {"state": ["A", "B"], "ts_s": [2, 4], "event_id": [2, 4]}
    )
    out = list(fn(("k",), [chunk1, chunk2], st))
    closed = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    assert list(closed["state"]) == ["A"] and list(closed["n_events"]) == [3]
    assert st.get == ("B", 1, 1)  # B-run open with the next run_id
