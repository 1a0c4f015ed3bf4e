"""Degenerate-data sweep: EVERY registered query must run (possibly to
an empty result) against a minimal fixture — single rows, short
documents, lone embeddings. This is the class of breakage a fixture
regeneration caused in round 2 (and the short-doc shingle crash): the
engine's contract is "empty result", never "exception", on thin data.
"""

from __future__ import annotations

import pytest

from log2ck_spark.io import TABLES, tbl
from log2ck_spark.queries import QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def mini_sf_dir(spark, tmp_path_factory):
    """1-3 rows per table sampled from the smoke fixture, plus
    deliberately nasty documents (sub-shingle-width, single token)."""
    root = tmp_path_factory.mktemp("mini_sf")
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        df = tbl(spark, src, name).limit(3)
        if name == "documents":
            extra = spark.createDataFrame(
                [
                    (90001, "one two", "en", "src0", 7),
                    (90002, "x", "zh", "src1", 1),
                    (90003, None, None, "src2", 0),  # null text/lang
                ],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
            df = df.unionByName(extra)
        if name == "events":
            extra = spark.createDataFrame(
                [(990001, None, None, "error", None, None)],
                "event_id long, ts timestamp, user_id long, event_type string,"
                " value double, props string",
            )
            df = df.unionByName(extra)
        df.coalesce(1).write.parquet(str(root / f"{name}.parquet"))
    return str(root)


def test_pivot_daily_activity_sparse_day_yields_zero_not_null(
    spark, tmp_path_factory
):
    """A day with zero events of some type must pivot to a 0 count
    (SQL COUNT FILTER semantics), not the NULL Spark's pivot().count()
    natively emits — parity broke only on sparse data, so pin it."""
    root = tmp_path_factory.mktemp("sparse_ev")
    import datetime as _dt

    spark.createDataFrame(
        [(1, _dt.datetime(2024, 3, 1, 10, 0, 0), 7, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(root / "events.parquet"))
    row = QUERIES["pivot_daily_activity"](spark, str(root)).collect()[0]
    assert row.n_click == 1
    for c in ("n_error", "n_purchase", "n_signup", "n_view"):
        assert getattr(row, c) == 0  # not None


def test_ingest_binaryfile_empty_sample_yields_zero_rows(
    spark, tmp_path_factory
):
    """A corpus where the 1-in-50 staging sample selects NOTHING must
    produce an empty frame, not a PATH_NOT_FOUND from scanning an
    empty staging dir (pathGlobFilter vs path-glob regression)."""
    root = tmp_path_factory.mktemp("nobin")
    spark.createDataFrame(
        [(1, "a", "en", "s", 1), (2, "b", "en", "s", 1), (3, "c", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(root / "documents.parquet"))
    assert QUERIES["ingest_binaryfile"](spark, str(root)).count() == 0


_EMBEDDING_QUERIES = (
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_semantic",
    "embedding_centroid",
    "embedding_dim_stats",
    "embedding_kmeans",
    "embedding_normalize",
    "embedding_quantize",
    "knn_classify",
    "similarity_ivf",
    "similarity_lsh",
    "similarity_topk",
)


def test_embedding_queries_survive_empty_table(spark, tmp_path_factory):
    """ZERO-row embeddings table (one step past the 1-3-row mini
    fixture): every embedding-path query must return an empty frame,
    not raise — the driver-side training/seed collects come back
    empty (1-D empty np.array, None from .first()) and previously
    IndexError'd in _fixedpoint_lloyd / AttributeError'd on .first().d
    instead of degrading."""
    root = tmp_path_factory.mktemp("empty_emb")
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        df = tbl(spark, src, name)
        if name == "embeddings":
            df = df.limit(0)
        else:
            df = df.limit(3)
        df.coalesce(1).write.parquet(str(root / f"{name}.parquet"))
    failures = []
    for name in _EMBEDDING_QUERIES:
        try:
            rows = QUERIES[name](spark, str(root)).collect()
            if rows:
                failures.append((name, f"expected empty, got {len(rows)} rows"))
        except Exception as e:  # noqa: BLE001 - report all at once
            failures.append((name, str(e).splitlines()[0][:120]))
    assert not failures, failures


def test_partitioned_readback_survives_all_empty_tables(
    spark, tmp_path_factory
):
    """ALL tables at zero rows. A full sweep (run out-of-band) shows
    exactly two queries ever broke here — the two that write a
    date-partitioned sink and read it back: partitionBy on a zero-row
    frame commits no partition directories, so schema INFERENCE fails
    where an explicit reader schema yields the contractual empty
    frame. Pin those two; the embedding-path zero-row class has its
    own test above."""
    root = tmp_path_factory.mktemp("empty_all")
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        tbl(spark, src, name).limit(0).coalesce(1).write.parquet(
            str(root / f"{name}.parquet")
        )
    for name in ("scan_partition_prune", "sink_table"):
        assert QUERIES[name](spark, str(root)).collect() == []


def test_every_query_survives_minimal_data(spark, mini_sf_dir):
    failures = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, mini_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 - we report them all at once
            failures.append((name, str(e).splitlines()[0][:120]))
    assert not failures, failures
