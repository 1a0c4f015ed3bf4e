"""Registry rotation: the driver checks only the first 50 names, so
ordering IS coverage. Pinned names lead; behind them, names whose
LATEST driver row FAILED re-surface first, then names with no
CORRECTNESS_r*.json row ever, then stalest greens."""

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


def _rank(last, n):
    rec = last.get(n)
    if rec is None:
        return 1  # never checked (local oracle evidence only)
    if rec[1]:
        return 0  # latest driver row errored: worst standing evidence
    return 2  # green


def test_errored_then_never_checked_then_green():
    last = _last_checked_rounds()
    assert last, "driver correctness records should exist from r1/r2"
    names = list(QUERIES)
    pinned = set(ROTATION_FIRST)
    rest = [n for n in names if n not in pinned]
    # within the unpinned tail: ranks must be non-decreasing
    ranks = [_rank(last, n) for n in rest]
    assert ranks == sorted(ranks), (
        "rotation order broken: " + str(list(zip(rest, ranks))[:10])
    )


def test_errored_rows_resurface_before_stale_green():
    """A query whose LATEST driver row errored (e.g. the r2 NTZ
    failures) must sort ahead of every green query in the unpinned
    tail — a failed external check is not evidence of health."""
    last = _last_checked_rounds()
    pinned = set(ROTATION_FIRST)
    rest = [n for n in QUERIES if n not in pinned]
    err_pos = [i for i, n in enumerate(rest) if _rank(last, n) == 0]
    green_pos = [i for i, n in enumerate(rest) if _rank(last, n) == 2]
    if err_pos and green_pos:
        assert max(err_pos) < min(green_pos)


def test_every_query_name_is_unique_and_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_silent_value_mismatch_counts_as_failed(tmp_path, monkeypatch):
    """A driver row with hash_match=false but err=null is a FAILED
    check: it must rank with the errored rows (re-surface), never as
    green."""
    import json

    import log2ck_spark.queries as q

    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(
        json.dumps(
            {
                "mismatched": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                    "err": None,
                },
                "healthy": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                },
            }
        )
    )
    real_glob = __import__("glob").glob

    def fake_glob(pattern):
        if "CORRECTNESS_r" in pattern:
            return [str(art)]
        return real_glob(pattern)

    monkeypatch.setattr("glob.glob", fake_glob)
    last = q._last_checked_rounds()
    assert last["mismatched"] == (99, True)
    assert last["healthy"] == (99, False)


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must reference only registered query
    names — a rename in the registry would otherwise surface as a
    KeyError at round-bench time, failing BENCH_r{N} outright."""
    import bench

    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    # the r3 cross-round comparison subset is HEADLINE[:27] BY
    # POSITION — pin the exact names and order, or r3_subset_total
    # silently sums a different query set across rounds
    assert bench.HEADLINE[:27] == [
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "agg_group_count",
        "agg_time_bucket",
        "topk_order_limit",
        "json_extract",
        "join_dim",
        "window_rank",
        "window_running",
        "filter_predicate",
        "parse_monolog",
        "sink_table",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "similarity_topk",
        "similarity_lsh",
        "text_token_count",
        "text_quality_score",
        "multimodal_meta",
        "stream_tumbling_agg",
        "stream_session_window",
        "asof_join",
        "range_join_bucketed",
        "dedup_clusters",
        "sample_hash_bernoulli",
    ]
