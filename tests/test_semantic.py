"""Invariant tests for the semantic operators (embedding_kmeans /
dedup_semantic): determinism, partition of the corpus, Lloyd
convergence of the fixed-point trainer, mutation tests proving both
DuckDB value oracles have teeth, and precision/recall of SemDeDup
against the brute-force near-dup ground truth."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from log2ck_spark.functions.vectors import as_double, cosine
from log2ck_spark.io import tbl
from log2ck_spark.queries import QUERIES, load_all
from log2ck_spark.queries.semantic import _SEMDEDUP_TAU

load_all()


@pytest.fixture(scope="module")
def brute_force_drops(spark, sf_dir):
    """vec_ids having at least one smaller-id neighbor at cos >= tau —
    the exact SemDeDup drop set if clustering never split a pair."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    rows = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= _SEMDEDUP_TAU)
        .select("doc_b")
        .distinct()
        .collect()
    )
    return {r.doc_b for r in rows}


def test_kmeans_partitions_corpus_and_is_deterministic(spark, sf_dir):
    km1 = QUERIES["embedding_kmeans"](spark, sf_dir).collect()
    km2 = QUERIES["embedding_kmeans"](spark, sf_dir).collect()
    assert sorted(map(tuple, km1)) == sorted(map(tuple, km2))
    n_vecs = tbl(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in km1) == n_vecs
    assert all(r.inertia >= 0 for r in km1)


def test_semdedup_drop_set_precision_and_recall(
    spark, sf_dir, brute_force_drops
):
    sd = QUERIES["dedup_semantic"](spark, sf_dir)
    dropped = {r.vec_id for r in sd.filter(F.col("is_kept") == 0).collect()}
    # precision 1.0: every dropped vector truly has a smaller-id
    # near-dup somewhere (cluster-local verify is exact cosine).
    assert dropped <= brute_force_drops
    # recall: clustering may split a near-dup pair across cells, but
    # near-dups sit at small angles, so most pairs share a cell.
    if brute_force_drops:
        recall = len(dropped) / len(brute_force_drops)
        assert recall >= 0.5, f"semdedup recall {recall:.2f} too low"


def test_semdedup_emits_every_vector_once(spark, sf_dir):
    sd = QUERIES["dedup_semantic"](spark, sf_dir)
    n_vecs = tbl(spark, sf_dir, "embeddings").count()
    assert sd.count() == n_vecs
    assert sd.select("vec_id").distinct().count() == n_vecs


def test_kmeans_training_invariants_on_fixture_sample(spark, sf_dir):
    """Lloyd's-specific evidence for the fixed-point trainer: (a) each
    iteration is non-increasing in sample inertia (the textbook
    convergence guarantee survives quantization: the update step's
    floor-division mean is within rounding of the true minimizer), and
    (b) trained centroids strictly beat the seed init on the sample —
    i.e. the training half actually earns its keep over the bare
    seed-quantizer used by dedup_semantic."""
    import numpy as np

    from log2ck_spark.functions.vectors import as_double
    from log2ck_spark.queries.semantic import (
        _LLOYD_ITERS,
        _fixedpoint_lloyd,
        _quantize_expr,
        _SAMPLE_CAP,
    )

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    sample_z = np.array(
        [
            r.z
            for r in e.select(
                _quantize_expr("v").alias("z"),
                F.md5(F.col("vec_id").cast("string")).alias("hh"),
                "vec_id",
            )
            .orderBy("hh", "vec_id")
            .limit(_SAMPLE_CAP)
            .collect()
        ],
        dtype=np.int64,
    )
    k = min(16, len(sample_z))

    def inertia(cents):
        d2 = ((sample_z[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return int(d2.min(axis=1).sum())

    # step-by-step replay of _fixedpoint_lloyd with an inertia probe:
    # floor-division means round each component by < 1 quantized unit,
    # so per-iteration inertia can rise by at most n * dims (one unit
    # squared per component) — negligible vs the ~1e12 inertia scale.
    cents = sample_z[:k].copy()
    init_inertia = inertia(cents)
    prev = init_inertia
    slack = len(sample_z) * sample_z.shape[1]
    for _ in range(_LLOYD_ITERS):
        d2 = ((sample_z[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = sample_z[assign == j]
            if len(members):
                cents[j] = members.sum(axis=0) // len(members)
        cur = inertia(cents)
        assert cur <= prev + slack, "Lloyd iteration increased inertia"
        prev = cur
    # the shared helper must land exactly where this replay lands —
    # bit-identical, not allclose: the whole point of fixed-point
    trained = _fixedpoint_lloyd(sample_z, k)
    assert (trained == cents).all()
    # and training must strictly beat the raw seed init on the sample
    assert inertia(trained) < init_inertia


def test_kmeans_oracle_has_teeth(spark, sf_dir):
    """Mutation test of the r5 value check: an UNDER-TRAINED Spark run
    (zero Lloyd iterations = bare seed init) must produce a different
    result than the fully-trained oracle replay — proving the DuckDB
    replay checks the training loop itself, not just the assignment
    scan."""
    import duckdb

    import log2ck_spark.queries.semantic as sem
    from log2ck_spark.queries import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    oracle = {
        tuple(r)
        for r in con.execute(ORACLES["embedding_kmeans"]).fetchall()
    }

    def spark_rows():
        return {
            tuple(r)
            for r in QUERIES["embedding_kmeans"](spark, sf_dir).collect()
        }

    assert spark_rows() == oracle  # healthy: exact match
    orig = sem._LLOYD_ITERS
    try:
        sem._LLOYD_ITERS = 0  # mutate: skip training entirely
        assert spark_rows() != oracle, (
            "oracle failed to distinguish untrained seed init from "
            f"{orig} Lloyd iterations — the value check has no teeth"
        )
    finally:
        sem._LLOYD_ITERS = orig


def test_semdedup_oracle_has_teeth(spark, sf_dir):
    """Mutation test of the r5 value check: a semantically WRONG Spark
    run (narrower probing than the oracle replays) must produce a
    different result set — proving the DuckDB replay would catch a
    real bug, not just bless whatever Spark emits."""
    import duckdb

    import log2ck_spark.queries.semantic as sem
    from log2ck_spark.queries import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    oracle = {
        tuple(r)
        for r in con.execute(ORACLES["dedup_semantic"]).fetchall()
    }

    def spark_rows():
        return {
            tuple(r)
            for r in QUERIES["dedup_semantic"](spark, sf_dir).collect()
        }

    assert spark_rows() == oracle  # healthy: exact match
    orig = sem._NPROBE
    try:
        sem._NPROBE = 1  # mutate: single-probe misses boundary pairs
        assert spark_rows() != oracle, (
            "oracle failed to distinguish nprobe=1 from nprobe=4 — "
            "the value check has no teeth on this fixture"
        )
    finally:
        sem._NPROBE = orig
