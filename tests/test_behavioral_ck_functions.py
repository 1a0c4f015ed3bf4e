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


def test_strict_order_interruption_is_the_ck_docs_example(
    spark, tmp_path
):
    """CK's own strict_order example: A->B->D->C stops the A->B->C
    search at the D, max level 2. Here view->click->error->purchase:
    the error (ANY other event — no type filter in strict mode) kills
    the chain before the purchase."""
    rows = [
        (1, 1, "view", 0), (2, 1, "click", 10),
        (3, 1, "error", 20), (4, 1, "purchase", 30),
        # u2: the same stream WITHOUT the interloper -> level 3
        (5, 2, "view", 0), (6, 2, "click", 10), (7, 2, "purchase", 30),
    ]
    got = {
        r.level: r.n_users
        for r in _run(
            spark, tmp_path, "window_funnel_strict_order",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {2: 1, 3: 1}


def test_strict_order_requires_consecutive_steps_and_window(
    spark, tmp_path
):
    rows = [
        # u1: view then a signup between view and click -> chain dead
        # at the signup; the later click has no adjacent view -> 1
        (1, 1, "view", 0), (2, 1, "signup", 5), (3, 1, "click", 10),
        # u2: consecutive view,click but purchase past view + W -> 2
        (4, 2, "view", 0), (5, 2, "click", 10), (6, 2, "purchase", W + 1),
        # u3: consecutive triple with purchase EXACTLY at view+W -> 3
        (7, 3, "view", 0), (8, 3, "click", 10), (9, 3, "purchase", W),
        # u4: a second chain succeeds after an interrupted first
        (10, 4, "view", 0), (11, 4, "error", 1),
        (12, 4, "view", 2), (13, 4, "click", 3), (14, 4, "purchase", 4),
    ]
    got = {
        r.level: r.n_users
        for r in _run(
            spark, tmp_path, "window_funnel_strict_order",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_strict_dedup_repeat_condition_interrupts(spark, tmp_path):
    """CK strict_deduplication: a repeat of an already-held condition
    interrupts FURTHER processing (the level reached stands)."""
    rows = [
        # u1: view,click then a second CLICK before purchase ->
        # condition 2 repeats -> stuck at level 2 (the second click's
        # own chain has no adjacent view... its nearest prior
        # view-or-click is a click) -> 2
        (1, 1, "view", 0), (2, 1, "click", 10),
        (3, 1, "click", 20), (4, 1, "purchase", 30),
        # u2: view,click then a second VIEW before purchase ->
        # condition 1 repeats, chain dead; the second view's new
        # chain has no click before the purchase -> 2
        (5, 2, "view", 0), (6, 2, "click", 10),
        (7, 2, "view", 20), (8, 2, "purchase", 30),
        # u3: clean chain -> 3 (a purchase between steps would NOT
        # interrupt — condition 3 never held mid-chain)
        (9, 3, "view", 0), (10, 3, "click", 10), (11, 3, "purchase", 20),
        # u4: view, PURCHASE, click, purchase -> the early purchase
        # (condition 3, not yet held) does not interrupt -> 3
        (12, 4, "view", 0), (13, 4, "purchase", 5),
        (14, 4, "click", 10), (15, 4, "purchase", 20),
    ]
    got = {
        r.level: r.n_users
        for r in _run(
            spark, tmp_path, "window_funnel_strict_dedup",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {2: 2, 3: 2}


def test_strict_dedup_second_view_restarts_with_fresh_window(
    spark, tmp_path
):
    """The dedup kill and the restart interact: view1,click1,view2,
    click2,purchase — view2 kills chain 1 at level 2, but (view2,
    click2, purchase) is a complete fresh chain -> 3. And the fresh
    chain's window anchors at view2, rescuing a purchase past
    view1 + W."""
    rows = [
        (1, 1, "view", 0), (2, 1, "click", 10),
        (3, 1, "view", W), (4, 1, "click", W + 10),
        (5, 1, "purchase", W + 20),  # past view1+W, inside view2+W
    ]
    got = {
        r.level: r.n_users
        for r in _run(
            spark, tmp_path, "window_funnel_strict_dedup",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {3: 1}


def test_sequence_match_time_adjacency_and_bound(spark, tmp_path):
    """(?1)(?t<=3600)(?2): the click must DIRECTLY follow the signup
    among condition events (a view between is ignored — it matches no
    condition; a second signup between is NOT, it matches ?1), and
    the gap bound is inclusive."""
    rows = [
        # u1: signup then click 3600s later -> inclusive bound, True
        (1, 1, "signup", 0), (2, 1, "click", 3600),
        # u2: gap one second over -> False
        (3, 2, "signup", 0), (4, 2, "click", 3601),
        # u3: a view between signup and click is invisible -> True
        (5, 3, "signup", 0), (6, 3, "view", 100), (7, 3, "click", 200),
        # u4: a second signup between resets adjacency — the click's
        # predecessor is signup@100, still within bound -> True
        (8, 4, "signup", 0), (9, 4, "signup", 100), (10, 4, "click", 200),
        # u5: click before signup -> False
        (11, 5, "click", 0), (12, 5, "signup", 100),
    ]
    got = {
        r.user_id: r.matched
        for r in _run(
            spark, tmp_path, "sequence_match_time",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: False}


def test_strict_increase_equal_timestamps_cannot_chain(
    spark, tmp_path
):
    """strict_increase: chain steps need STRICTLY increasing ts —
    the exact stream that reaches level 3 under the default mode's
    tie-inclusive contract stalls where timestamps repeat."""
    rows = [
        # u1: view and click at the SAME instant, purchase later ->
        # click can't chain on the tied view -> level 1
        (1, 1, "view", 0), (2, 1, "click", 0), (3, 1, "purchase", 10),
        # u2: strictly increasing triple -> 3
        (4, 2, "view", 0), (5, 2, "click", 1), (6, 2, "purchase", 2),
        # u3: click strictly after view, purchase TIED with click -> 2
        (7, 3, "view", 0), (8, 3, "click", 5), (9, 3, "purchase", 5),
        # u4: window still anchors at the view — purchase at view+W
        # inclusive -> 3
        (10, 4, "view", 0), (11, 4, "click", 1), (12, 4, "purchase", W),
    ]
    got = {
        r.level: r.n_users
        for r in _run(
            spark, tmp_path, "window_funnel_strict_increase",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_sequence_next_node_first_match_and_stream_edges(
    spark, tmp_path
):
    """forward/first_match semantics: adjacent view→click in the FULL
    stream (an interloper kills the match there), earliest chain wins,
    next-after-last-event is NULL, unmatched users emit no row."""
    rows = [
        # u1: view,click,purchase -> next node after first chain =
        # purchase (a later view,click,error chain is ignored)
        (1, 1, "view", 0), (2, 1, "click", 1), (3, 1, "purchase", 2),
        (4, 1, "view", 3), (5, 1, "click", 4), (6, 1, "error", 5),
        # u2: chain at the very end of the stream -> NULL next node
        (7, 2, "error", 0), (8, 2, "view", 1), (9, 2, "click", 2),
        # u3: view,ERROR,click -> interloper breaks adjacency -> no row
        (10, 3, "view", 0), (11, 3, "error", 1), (12, 3, "click", 2),
        # u4: first adjacent pair is later in the stream
        (13, 4, "click", 0), (14, 4, "view", 1), (15, 4, "click", 2),
        (16, 4, "signup", 3),
    ]
    got = {
        r.user_id: r.next_node
        for r in _run(
            spark, tmp_path, "sequence_next_node",
            _mk_events(spark, rows),
        ).collect()
    }
    assert got == {1: "purchase", 2: None, 4: "signup"}


def test_uniq_up_to_caps_at_n_plus_one(spark, tmp_path):
    """uniqUpTo(8): exact when distinct <= 8, pinned 9 when over;
    NULL user_ids skipped."""
    rows = []
    eid = 1
    # 'view': 3 distinct users -> exact 3
    for u in (1, 2, 3):
        rows.append((eid, u, "view", eid)); eid += 1
    # 'click': 12 distinct users -> capped 9
    for u in range(10, 22):
        rows.append((eid, u, "click", eid)); eid += 1
    df = _mk_events(spark, rows)
    # add one NULL-user view row (skipped by the aggregate)
    import datetime as _dt
    null_row = spark.createDataFrame(
        [(999, _dt.datetime(2024, 1, 1), None, "view", 1.0, "{}")],
        df.schema,
    )
    got = {
        r.event_type: (r.u_upto, r.n_events)
        for r in _run(
            spark, tmp_path, "uniq_up_to", df.unionByName(null_row)
        ).collect()
    }
    assert got == {"view": (3, 4), "click": (9, 12)}
