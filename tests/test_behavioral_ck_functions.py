"""Semantics pins for the ClickHouse behavioral-aggregate trio
(`window_funnel`, `sequence_count`, `retention_flags`) on hand-built
corpora where every edge is visible: window boundaries (inclusive),
chain-start overwriting, tie timestamps, greedy non-overlap, and the
retention first-condition gate. The DuckDB oracle parity is the
driver's job; these pin the ENGINE semantics against hand-derived
expectations so an oracle-and-engine-both-wrong drift cannot hide.
"""

from __future__ import annotations

import datetime as dt


def _mk_events(spark, rows):
    # rows: (event_id, user_id, type, seconds-offset)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (eid, base + dt.timedelta(seconds=s), uid, t, 1.0, "{}")
        for eid, uid, t, s in rows
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


W = 6 * 3600  # the query's pinned 6h funnel window, in seconds


def test_window_funnel_levels_and_window_boundary(spark, tmp_path):
    rows = [
        # u1: full chain inside the window -> level 3
        (1, 1, "view", 0), (2, 1, "click", 100), (3, 1, "purchase", 200),
        # u2: purchase EXACTLY at view + W -> inclusive, level 3
        (4, 2, "view", 0), (5, 2, "click", 50), (6, 2, "purchase", W),
        # u3: purchase one second past the window -> level 2
        (7, 3, "view", 0), (8, 3, "click", 50), (9, 3, "purchase", W + 1),
        # u4: click before any view -> level 1 (only the view counts)
        (10, 4, "click", 0), (11, 4, "view", 100),
        # u5: stage event only from mid-chain -> level 0
        (12, 5, "purchase", 0), (13, 5, "click", 10),
    ]
    got = {
        r.level: r.n_users
        for r in _run(spark, tmp_path, "window_funnel", _mk_events(spark, rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}


def test_window_funnel_later_chain_start_rescues_level(spark, tmp_path):
    """The CK property the running max encodes: a LATER view restarts
    the chain and widens the remaining window, so a purchase too far
    from the first view still completes via the second."""
    rows = [
        (1, 1, "view", 0),
        (2, 1, "view", W),          # second chance
        (3, 1, "click", W + 100),
        (4, 1, "purchase", W + 200),  # > first view + W, <= second + W
    ]
    got = {
        r.level: r.n_users
        for r in _run(spark, tmp_path, "window_funnel", _mk_events(spark, rows)).collect()
    }
    assert got == {3: 1}


def test_window_funnel_tie_inclusive(spark, tmp_path):
    """Equal timestamps chain (the pinned tie contract): view, click,
    purchase all at the same instant reach level 3 regardless of
    event_id order."""
    rows = [(3, 1, "purchase", 0), (1, 1, "view", 0), (2, 1, "click", 0)]
    got = {
        r.level: r.n_users
        for r in _run(spark, tmp_path, "window_funnel", _mk_events(spark, rows)).collect()
    }
    assert got == {3: 1}


def test_sequence_count_greedy_non_overlapping(spark, tmp_path):
    rows = [
        # u1: V V C C V C -> greedy matches 2 (VC, VC), not 3
        (1, 1, "view", 0), (2, 1, "view", 10), (3, 1, "click", 20),
        (4, 1, "click", 30), (5, 1, "view", 40), (6, 1, "click", 50),
        # u2: C V -> 0 chains (click before any view)
        (7, 2, "click", 0), (8, 2, "view", 10),
        # u3: V C V -> 1 chain, trailing view unmatched
        (9, 3, "view", 0), (10, 3, "click", 5), (11, 3, "view", 9),
    ]
    got = {
        r.user_id: r.n_chains
        for r in _run(spark, tmp_path, "sequence_count", _mk_events(spark, rows)).collect()
    }
    assert got == {1: 2, 2: 0, 3: 1}


def test_retention_flags_gate_on_first_condition(spark, tmp_path):
    rows = [
        # u1: signup + click + purchase -> counts everywhere
        (1, 1, "signup", 0), (2, 1, "click", 10), (3, 1, "purchase", 20),
        # u2: click + purchase but NO signup -> counts nowhere
        (4, 2, "click", 0), (5, 2, "purchase", 10),
        # u3: signup only
        (6, 3, "signup", 0),
        # u4: purchase BEFORE signup -> retention is order-free: counts
        (7, 4, "purchase", 0), (8, 4, "signup", 10),
    ]
    (r,) = _run(
        spark, tmp_path, "retention_flags", _mk_events(spark, rows)
    ).collect()
    assert (r.n_signup, r.n_signup_and_click, r.n_signup_and_purchase) == (
        3, 1, 2,
    )


def test_sequence_match_order_and_negatives(spark, tmp_path):
    rows = [
        # u1: in order -> matched
        (1, 1, "signup", 0), (2, 1, "click", 10), (3, 1, "purchase", 20),
        # u2: purchase BEFORE click -> not matched
        (4, 2, "signup", 0), (5, 2, "purchase", 10), (6, 2, "click", 20),
        # u3: missing the middle stage -> not matched
        (7, 3, "signup", 0), (8, 3, "purchase", 10),
        # u4: all at the same instant -> tie-inclusive, matched
        (9, 4, "purchase", 0), (10, 4, "click", 0), (11, 4, "signup", 0),
        # u5: interleaved noise events don't break '.*'
        (12, 5, "signup", 0), (13, 5, "purchase", 5), (14, 5, "click", 10),
        (15, 5, "purchase", 15),
    ]
    got = {
        r.user_id: r.matched
        for r in _run(spark, tmp_path, "sequence_match", _mk_events(spark, rows)).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: True, 5: True}
