"""Semantics pins for the CK statistical/interval aggregate trio
(`max_intersections`, `delta_sum`, `welch_ttest`) on hand-built
corpora where every edge is hand-derivable: touching-endpoint
netting and earliest-position tie-breaks for the sweep, skip-NULL
adjacency and ignored negative deltas for deltaSum, and the closed
Welch t/df formulas. The DuckDB oracle parity is the driver's job;
these pin the ENGINE semantics against hand-derived expectations so
an oracle-and-engine-both-wrong drift cannot hide.
"""

from __future__ import annotations

import datetime as dt

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
BASE_US = int(
    dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
)


def _mk_events(spark, rows):
    # rows: (event_id, user_id, type, seconds-offset, value)
    data = [
        (eid, BASE + dt.timedelta(seconds=s), uid, t, v, "{}")
        for eid, uid, t, s, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _run(spark, tmp_path, name, df):
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES[name](spark, str(tmp_path))


# interval length is 1 s + value/10 s (fmod-derived): value=10 -> 2 s
def test_max_intersections_overlap_and_position(spark, tmp_path):
    rows = [
        # type a: [0,6] and [2,4] overlap (peak 2 at t=2); [10,12] alone
        (1, 1, "a", 0, 50.0),
        (2, 1, "a", 2, 10.0),
        (3, 1, "a", 10, 10.0),
    ]
    got = {
        r.event_type: (r.max_open, r.pos_us)
        for r in _run(
            spark, tmp_path, "max_intersections", _mk_events(spark, rows)
        ).collect()
    }
    assert got == {"a": (2, BASE_US + 2_000_000)}


def test_max_intersections_touching_endpoints_do_not_stack(spark, tmp_path):
    """[0,1] and [1,2] share only the instant t=1: the -1 end and the
    +1 start are RANGE-frame peers, so the sweep nets them and the
    peak stays 1 — touching intervals are not concurrent. Earliest
    peak position is t=0 (the first interval's start)."""
    rows = [
        (1, 1, "b", 0, 0.0),   # [0, 1]
        (2, 1, "b", 1, 0.0),   # [1, 2]
    ]
    got = {
        r.event_type: (r.max_open, r.pos_us)
        for r in _run(
            spark, tmp_path, "max_intersections", _mk_events(spark, rows)
        ).collect()
    }
    assert got == {"b": (1, BASE_US)}


def test_delta_sum_ignores_negative_and_skips_nulls(spark, tmp_path):
    rows = [
        # u1 walk (cents): 100 -> 300 (+200) -> 200 (drop, ignored)
        # -> 500 (+300) -> NULL (skipped, adjacency preserved)
        # -> 400 (vs 500: drop, ignored)      => delta_sum = 500, n = 5
        (1, 1, "m", 0, 1.0),
        (2, 1, "m", 1, 3.0),
        (3, 1, "m", 2, 2.0),
        (4, 1, "m", 3, 5.0),
        (5, 1, "m", 4, None),
        (6, 1, "m", 5, 4.0),
        # u2: single observation -> no deltas, COALESCE'd zero
        (7, 2, "m", 0, 9.0),
    ]
    got = {
        r.user_id: (r.n_samples, r.delta_sum)
        for r in _run(
            spark, tmp_path, "delta_sum", _mk_events(spark, rows)
        ).collect()
    }
    assert got == {1: (5, 500), 2: (1, 0)}


def test_welch_ttest_closed_form(spark, tmp_path):
    """clicks [1,2,3] vs views [2,4,6,8]: ma=2 va=1, mb=5 vb=20/3;
    se2=2, t=-3/sqrt(2), df=4/(1/18+25/27) — hand-derived."""
    rows = [
        (1, 1, "click", 0, 1.0),
        (2, 1, "click", 1, 2.0),
        (3, 1, "click", 2, 3.0),
        (4, 2, "view", 0, 2.0),
        (5, 2, "view", 1, 4.0),
        (6, 2, "view", 2, 6.0),
        (7, 2, "view", 3, 8.0),
        (8, 3, "purchase", 0, 99.0),  # other types excluded
    ]
    (r,) = _run(
        spark, tmp_path, "welch_ttest", _mk_events(spark, rows)
    ).collect()
    assert (r.n_click, r.n_view) == (3, 4)
    assert abs(r.t_stat - (-2.121320)) < 1e-6
    assert abs(r.df_welch - 4.075472) < 1e-6


def test_welch_ttest_undersized_sample_yields_null(spark, tmp_path):
    """One-observation 'view' sample: variance undefined, so t/df are
    NULL (CK returns nan there) — and no division raises under ANSI."""
    rows = [
        (1, 1, "click", 0, 1.0),
        (2, 1, "click", 1, 2.0),
        (3, 2, "view", 0, 5.0),
    ]
    (r,) = _run(
        spark, tmp_path, "welch_ttest", _mk_events(spark, rows)
    ).collect()
    assert (r.n_click, r.n_view) == (2, 1)
    assert r.t_stat is None and r.df_welch is None
