"""Invariant tests for the rows-only semantic operators
(embedding_kmeans / dedup_semantic): determinism, partition of the
corpus, and precision/recall of SemDeDup against the brute-force
near-dup ground truth."""

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
