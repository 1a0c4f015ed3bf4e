"""Registry rotation: the driver checks only the first 50 names, so
ordering IS coverage. Pinned names lead; behind them, names with no
CORRECTNESS_r*.json row ever must sort before already-checked ones."""

from __future__ import annotations

from log2ck_spark.queries import (
    QUERIES,
    ROTATION_FIRST,
    _last_checked_rounds,
    load_all,
)

load_all()


def test_pinned_names_lead_registry():
    names = list(QUERIES)
    assert names[: len(ROTATION_FIRST)] == [
        n for n in ROTATION_FIRST if n in QUERIES
    ]


def test_never_checked_sort_before_checked():
    last = _last_checked_rounds()
    assert last, "driver correctness records should exist from r1/r2"
    names = list(QUERIES)
    pinned = set(ROTATION_FIRST)
    rest = [n for n in names if n not in pinned]
    # within the unpinned tail: all never-checked names come first
    seen_checked = False
    for n in rest:
        if last.get(n, -1) >= 0:
            seen_checked = True
        else:
            assert not seen_checked, f"never-checked {n} sorted after checked names"


def test_every_query_name_is_unique_and_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
