"""Custom stateful streaming operator: the reference's dual-trigger
micro-batcher (A9, `/root/reference/src/Worker.php:119-129` — flush
when `count >= max_sent_count` OR `age > max_sent_wait`).

Spark's triggers are time-based only (SURVEY.md §7 traps), so the
count-OR-time contract is implemented as an `applyInPandasWithState`
operator: per key, state buffers (count, sum, first-seen wall time);
a flush row is emitted when either threshold trips, and the state
resets — exactly the reference's `batchWrite()` loop, but with
engine-managed, checkpointed state.

This is the (b) path from the build rules: an operator Spark's
built-ins genuinely can't express, done as a Pandas-batched stateful
transform — never row-at-a-time, state bounded to one small tuple per
key.
"""

from __future__ import annotations

import time
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLUSH_SCHEMA = (
    "key string, n_rows bigint, sum_value double, reason string, flushed_at double"
)
STATE_SCHEMA = "n bigint, total double, first_seen double"


def make_flusher(max_count: int = 100, max_wait_s: float = 10.0):
    """Returns the applyInPandasWithState function. Defaults mirror the
    reference's max_sent_count=100 / max_sent_wait=10s
    (`test.config.php:27-28`)."""

    def flush_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        now = time.time()
        if state.exists:
            n, total, first_seen = state.get
        else:
            n, total, first_seen = 0, 0.0, now
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        flushes = []
        if state.hasTimedOut or (n >= max_count) or (now - first_seen > max_wait_s):
            if n > 0:
                reason = (
                    "timeout"
                    if state.hasTimedOut
                    else ("count" if n >= max_count else "wait")
                )
                flushes.append(
                    pd.DataFrame(
                        [
                            {
                                "key": key[0],
                                "n_rows": n,
                                "sum_value": total,
                                "reason": reason,
                                "flushed_at": now,
                            }
                        ]
                    )
                )
            state.remove()
        else:
            state.update((n, total, first_seen))
            # REMAINING wait, not the full window: the timeout resets
            # on every batch that touches the key, so re-arming with
            # max_wait_s would let a late second event push the first
            # event's flush out to ~2x max_wait_s (event A at t=0,
            # event B at t=9 with a 10s window re-armed the clock to
            # t=19). Age is measured from first_seen, so arm exactly
            # the time left on that contract.
            remaining_ms = int((max_wait_s - (now - first_seen)) * 1000)
            state.setTimeoutDuration(max(1, remaining_ms))
        for f in flushes:
            yield f

    return flush_fn


def dual_trigger_flush(
    events: DataFrame,
    key_col: str = "event_type",
    max_count: int = 100,
    max_wait_s: float = 10.0,
) -> DataFrame:
    """Streaming DataFrame of flush records for a keyed event stream
    with a `value` column. Use in update output mode."""
    return events.groupBy(key_col).applyInPandasWithState(
        make_flusher(max_count, max_wait_s),
        outputStructType=FLUSH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------------------
# Streaming EWMA forecast-deviation alerting (per-key recurrence state)
# --------------------------------------------------------------------------

EWMA_SCHEMA = (
    "key string, n_events bigint, ewma double, n_alerts bigint"
)
EWMA_STATE_SCHEMA = "z double, n bigint, n_alerts bigint"


def make_ewma(
    alpha: float = 0.2,
    threshold: float = 25.0,
    one_minus: float | None = None,
):
    """applyInPandasWithState function maintaining the EWMA recurrence
    z = alpha*x + (1-alpha)*z per key across micro-batches, flagging
    events that deviate >= threshold from the running forecast. The
    batch analog (identical recurrence over a static table, DuckDB
    recursive-CTE oracle) is queries/behavior.anomaly_ewma; here the
    state (one 3-tuple per key) is engine-managed and checkpointed,
    so a restart resumes the forecast instead of re-learning it.

    Within a micro-batch, rows are processed in the frame order the
    engine delivers; callers needing strict event-time order should
    sort upstream per watermark (the batch analog sorts by (ts, id)).

    `one_minus` defaults to the IEEE-exact literal for the default
    alpha: 1.0 - 0.2 != 0.8 in doubles, and the batch analog pins the
    0.8 literal — the two paths must run the bit-identical recurrence
    or long histories drift apart ULP by ULP. A caller overriding
    alpha should pass its own paired literal."""
    if one_minus is None:
        one_minus = 0.8 if alpha == 0.2 else 1.0 - alpha

    def ewma_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            z, n, n_alerts = state.get
        else:
            z, n, n_alerts = None, 0, 0
        for pdf in pdfs:
            for v in pdf["value"].to_numpy():
                v = float(v)
                # a null/NaN value would make z NaN FOREVER (NaN
                # propagates through the recurrence and the
                # checkpoint); the batch analog filters nulls at the
                # scan — mirror that here.
                if v != v:
                    continue
                if z is None:
                    z = v
                else:
                    if abs(v - z) >= threshold:
                        n_alerts += 1
                    z = alpha * v + one_minus * z
                n += 1
        if n > 0:
            state.update((float(z), n, n_alerts))
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "n_events": n,
                        "ewma": float(z),
                        "n_alerts": n_alerts,
                    }
                ]
            )

    return ewma_fn


def ewma_alerts(
    events: DataFrame,
    key_col: str = "event_type",
    alpha: float = 0.2,
    threshold: float = 25.0,
    one_minus: float | None = None,
) -> DataFrame:
    """Streaming DataFrame of per-key EWMA snapshots (cumulative event
    count, current forecast, cumulative alert count). Update mode.
    `one_minus` passes through to make_ewma — a caller overriding
    alpha pins its paired literal HERE, or the streaming recurrence
    computes 1.0-alpha in doubles while its batch analog pins a
    literal, and the two drift ULP by ULP over long histories."""
    return events.groupBy(key_col).applyInPandasWithState(
        make_ewma(alpha, threshold, one_minus),
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNS_SCHEMA = "key string, run_id int, state string, n_events int"
RUNS_STATE_SCHEMA = "cur string, cnt int, run_id int"


def make_run_encoder(order_cols: tuple[str, ...] = ("ts_s", "event_id")):
    """applyInPandasWithState change-point encoder: per key, collapse
    consecutive same-state events into runs, EMITTING each run the
    moment the state changes — the streaming twin of
    queries/behavior.runs_encode (same islands semantics; there the
    change flags are a batch window, here the open run is engine-
    checkpointed state, so a restart resumes mid-run instead of
    splitting it). Rows are sorted by `order_cols` within each
    micro-batch; cross-batch order is the arrival order, as for every
    stateful operator here.

    State is THREE scalars per key (current state, count, run index)
    no matter how long the run — the change-point compression that
    turns an unbounded state stream into bounded streaming state."""

    def run_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            cur, cnt, run_id = state.get
        else:
            cur, cnt, run_id = None, 0, 0
        closed = []
        # ONE sort over the whole micro-batch: a key with more rows
        # than the Arrow batch size (spark.sql.execution.arrow.
        # maxRecordsPerBatch, default 10k) arrives as MULTIPLE chunks,
        # and sorting each independently re-splits/merges runs at
        # every chunk boundary where order straddles it. Concat is
        # bounded by the key's per-micro-batch volume — the same bound
        # the operator already carries.
        frames = list(pdfs)
        if frames:
            pdf = (
                frames[0]
                if len(frames) == 1
                else pd.concat(frames, ignore_index=True)
            )
            cols = [c for c in order_cols if c in pdf.columns]
            if cols:
                pdf = pdf.sort_values(cols)
            for s in pdf["state"].astype(str):
                if cur is None:
                    cur, cnt = s, 1
                elif s == cur:
                    cnt += 1
                else:
                    closed.append(
                        {
                            "key": key[0],
                            "run_id": run_id,
                            "state": cur,
                            "n_events": cnt,
                        }
                    )
                    run_id += 1
                    cur, cnt = s, 1
        if cur is not None:
            state.update((cur, cnt, run_id))
        if closed:
            yield pd.DataFrame(closed)

    return run_fn


def run_intervals(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming DataFrame of CLOSED runs per key (append mode — a run
    is emitted exactly once, when its successor state arrives)."""
    return events.groupBy(key_col).applyInPandasWithState(
        make_run_encoder(),
        outputStructType=RUNS_SCHEMA,
        stateStructType=RUNS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
