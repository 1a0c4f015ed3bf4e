"""Semantics pins for the CK statistical/interval aggregate family
(`max_intersections`, `interval_length_sum`, `delta_sum`,
`welch_ttest`, `mann_whitney_utest`, `cramers_v`) on hand-built
corpora where every edge is hand-derivable: touching-endpoint
netting, union-length merging, and earliest-position tie-breaks for
the sweeps; skip-NULL adjacency and ignored negative deltas for
deltaSum; the closed Welch t/df formulas; tied average ranks and the
tie-corrected variance for Mann-Whitney; perfect-association /
independence / degenerate-table anchors for Cramér's V. The DuckDB
oracle parity is the driver's job; these pin the ENGINE semantics
against hand-derived expectations so an oracle-and-engine-both-wrong
drift cannot hide.
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


def test_interval_length_sum_union_semantics(spark, tmp_path):
    """[0,6] ∪ [2,4] ∪ [10,12] covers 8 s (the contained interval
    adds nothing); touching [0,1] ∪ [1,2] merges to 2 s."""
    rows = [
        (1, 1, "a", 0, 50.0),   # [0, 6]
        (2, 1, "a", 2, 10.0),   # [2, 4] contained
        (3, 1, "a", 10, 10.0),  # [10, 12]
        (4, 1, "b", 0, 0.0),    # [0, 1]
        (5, 1, "b", 1, 0.0),    # [1, 2] touching
    ]
    got = {
        r.event_type: (r.n_intervals, r.covered_us)
        for r in _run(
            spark, tmp_path, "interval_length_sum",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {"a": (3, 8_000_000), "b": (2, 2_000_000)}


def test_mann_whitney_closed_form_with_ties(spark, tmp_path):
    """clicks [1,2,3] vs views [2,4] — one tied value (2). Average
    ranks: 1, 2.5, 2.5, 4, 5 → R_a=7.5, U_a=1.5; tie term (2³−2)=6,
    var = (6/12)·(6 − 6/20) = 2.85, z = −1.5/√2.85 — hand-derived."""
    import math

    rows = [
        (1, 1, "click", 0, 1.0),
        (2, 1, "click", 1, 2.0),
        (3, 1, "click", 2, 3.0),
        (4, 2, "view", 0, 2.0),
        (5, 2, "view", 1, 4.0),
    ]
    (r,) = _run(
        spark, tmp_path, "mann_whitney_utest", _mk_events(spark, rows)
    ).collect()
    assert (r.n_click, r.n_view) == (3, 2)
    assert abs(r.u_stat - 1.5) < 1e-9
    assert abs(r.z_score - (-1.5 / math.sqrt(2.85))) < 1e-6


def test_cramers_v_perfect_and_independent(spark, tmp_path):
    """Perfect association (each type owns its hour) → V = 1;
    a perfectly balanced 2×2 → chi2 = 0, V = 0."""
    perfect = [
        (1, 1, "x", 0, 1.0), (2, 1, "x", 1, 1.0),        # hour 0
        (3, 2, "y", 3600, 1.0), (4, 2, "y", 3601, 1.0),
        (5, 2, "y", 3602, 1.0),                           # hour 1
    ]
    (r,) = _run(
        spark, tmp_path, "cramers_v", _mk_events(spark, perfect)
    ).collect()
    assert (r.n, r.n_rows, r.n_cols) == (5, 2, 2)
    assert abs(r.chi2 - 5.0) < 1e-6 and abs(r.cramers_v - 1.0) < 1e-6

    balanced = [
        (1, 1, "x", 0, 1.0), (2, 1, "x", 3600, 1.0),
        (3, 2, "y", 1, 1.0), (4, 2, "y", 3601, 1.0),
    ]
    (r2,) = _run(
        spark, tmp_path, "cramers_v", _mk_events(spark, balanced)
    ).collect()
    assert r2.chi2 == 0.0 and r2.cramers_v == 0.0


def test_cramers_v_degenerate_single_row_table(spark, tmp_path):
    """One event_type only (r=1): chi2 is 0 but V is NULL — the
    min(r−1, c−1) denominator is undefined (CK returns nan)."""
    rows = [(1, 1, "x", 0, 1.0), (2, 1, "x", 3600, 1.0)]
    (r,) = _run(
        spark, tmp_path, "cramers_v", _mk_events(spark, rows)
    ).collect()
    assert r.n_rows == 1 and r.cramers_v is None
