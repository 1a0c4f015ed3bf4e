"""Focused tests for the r14 optimization internals.

1. pipelineops._min_label_cc (dedup_clusters' connected-components
   loop, restructured r14): the fused join-free round 1 + self-loop
   single-join rounds + label-sum convergence must produce the exact
   min-label fixpoint on star, clique, chain (diameter > 2, exercising
   the multi-round path), and empty graphs — and must do it in the
   round counts the restructure claims (the r13 shape ran an
   init-labels distinct plus TWO join rounds on a star graph; the
   fused shape runs ONE join round).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2ck_spark.queries.pipelineops import _min_label_cc


def _run_cc(spark, pairs):
    half = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    edges = half.unionByName(
        half.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels, converged, rounds = _min_label_cc(spark, edges, len(pairs))
    return {r.doc_id: r.label for r in labels.collect()}, converged, rounds


def test_min_label_cc_star_graphs_converge_in_two_rounds(spark):
    # two pairs + a triangle: every component is min-centered, so the
    # fused round 1 already produces the fixpoint and round 2 is the
    # convergence proof. The r13 shape needed an init distinct + 2 join
    # rounds for the same graphs; "rounds" here counts the fused
    # aggregation round too, so 2 == one join round executed.
    labels, converged, rounds = _run_cc(
        spark, [(1, 2), (5, 9), (10, 11), (10, 12), (11, 12)]
    )
    assert converged
    assert labels == {1: 1, 2: 1, 5: 5, 9: 5, 10: 10, 11: 10, 12: 10}
    assert rounds == 2


def test_min_label_cc_chain_diameter_four(spark):
    # 1-2-3-4-5 chain: min-label moves one hop per round, so the label
    # frontier takes 4 propagation rounds + 1 proof round — the
    # multi-round join path, including the self-loop rows that carry
    # each node's own label through the single join.
    labels, converged, rounds = _run_cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert converged
    assert labels == {i: 1 for i in range(1, 6)}
    assert rounds == 5


def test_min_label_cc_empty_graph_short_circuits(spark):
    labels, converged, rounds = _run_cc(spark, [])
    assert converged
    assert labels == {}
    assert rounds == 1
