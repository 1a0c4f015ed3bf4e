"""Rotation ACCOUNTING pinned by code against the real artifacts
(VERDICT r12 item 8): replay the recorded CORRECTNESS_r01..r{N}
history through `_last_checked_rounds` + the live registry order and
assert the r13 window composition — every r9-latest name plus the
oldest r10 tier, with never-checked names (this round's additions)
ahead of them — so the window math lives in a test, not in
ROTATION.md prose. The test reads the same files the registry reads,
so it keeps asserting the CURRENT round's invariant as artifacts
accrue: the first-50 window must always contain ALL names from the
oldest green tier (no stale name can hide behind a newer one)."""

from __future__ import annotations

import json
import pathlib

from log2ck_spark.queries import (
    QUERIES,
    ROTATION_FIRST,
    _last_checked_rounds,
    load_all,
)

load_all()

REPO = pathlib.Path(__file__).resolve().parent.parent
WINDOW = 50  # the driver hash-checks the first 50 names


def test_history_replay_matches_registry_accounting():
    """_last_checked_rounds must agree with an independent replay of
    the artifact files: latest round per name, error classification
    (err set, or any of rows/schema/hash False)."""
    expect: dict[str, tuple[int, bool]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        rows = json.loads(path.read_text())
        assert isinstance(rows, dict) and rows, path
        for name, row in rows.items():
            bad = isinstance(row, dict) and (
                row.get("err") not in (None, "no_oracle")
                or any(
                    row.get(k) is False
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            )
            prev = expect.get(name)
            if prev is None or rnd >= prev[0]:
                expect[name] = (rnd, bad)
    got = _last_checked_rounds()
    assert got == expect


def test_window_covers_entire_oldest_green_tier():
    """The core freshness invariant: the first-50 window must contain
    EVERY name whose latest green row sits in the oldest surviving
    tier (plus all errored and never-checked names). If this fails,
    some stalest name would silently wait another round."""
    last = _last_checked_rounds()
    window = set(list(QUERIES)[:WINDOW])
    errored = {n for n in QUERIES if n in last and last[n][1]}
    never = {n for n in QUERIES if n not in last}
    assert errored <= window, errored - window
    assert never <= window, never - window
    greens = sorted(
        (last[n][0], n) for n in QUERIES
        if n in last and not last[n][1]
    )
    # every green ROUND TIER that fits entirely in the remaining
    # budget must be fully inside the window (the boundary tier may
    # be split — which of ITS names fill the window is registration
    # order, deliberately unpinned); no name of an older tier may
    # wait behind a younger one
    budget = WINDOW - len(
        set(n for n in ROTATION_FIRST if n in QUERIES)
        | errored | never
    )
    from collections import Counter

    tier_sizes = Counter(r for r, _n in greens)
    covered = 0
    for rnd in sorted(tier_sizes):
        if covered + tier_sizes[rnd] > budget:
            break  # boundary tier: partial coverage allowed
        tier = {n for r, n in greens if r == rnd}
        missing = tier - window
        assert not missing, (
            f"r{rnd} tier names outside the window: {missing}"
        )
        covered += tier_sizes[rnd]


def test_r13_window_is_the_verdict_target():
    """The specific r13 shape VERDICT r12 item 1 demands, asserted
    against the REAL artifact history: zero pins; the 12 never-checked
    r13 additions lead; all 25 r9-latest names are inside the
    window; the rest of the window is the oldest r10 tier; and NO
    name with a row at r9 or older is left outside. Guarded to the
    r12-artifacts state so the test stays meaningful (not vacuous)
    after the r13 artifact lands: it then degrades to the generic
    invariant above."""
    have_r13 = (REPO / "CORRECTNESS_r13.json").exists()
    last = _last_checked_rounds()
    window = list(QUERIES)[:WINDOW]
    stale_outside = [
        n for n in QUERIES
        if n in last and last[n][0] <= 9 and n not in set(window)
    ]
    assert stale_outside == [], stale_outside
    if have_r13:
        return  # post-drain: the generic tier test carries the pin
    assert ROTATION_FIRST == (), "r13 must run zero-pin steady state"
    r9 = {n for n in QUERIES if n in last and last[n][0] == 9}
    assert len(r9) == 25 and r9 <= set(window)
    never = [n for n in window if n not in last]
    assert sorted(never) == [
        "cramers_v",
        "delta_sum",
        "interval_length_sum",
        "mann_whitney_utest",
        "max_intersections",
        "sequence_match_time",
        "sequence_next_node",
        "uniq_up_to",
        "welch_ttest",
        "window_funnel_strict_dedup",
        "window_funnel_strict_increase",
        "window_funnel_strict_order",
    ]
    # never-checked lead the window (ahead of every green)
    assert set(window[:len(never)]) == set(never)
    rest = [n for n in window if n in last]
    assert all(last[n][0] in (9, 10) for n in rest)
