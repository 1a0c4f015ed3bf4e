"""Plan-shaping helpers (r13 optimization round).

Catalyst's PushDownPredicates substitutes a filter's column references
with their defining expressions and sinks the filter below the
projection that computes them. For a cheap predicate that is pure win;
for a predicate over an EXPENSIVE derived column (regex parse
pipelines, array_intersect Jaccard, cosine similarity) it means the
whole expression tree is evaluated twice per row — once in the pushed
filter, once again in the projection above it. Whole-stage codegen's
subexpression elimination shares work within a single operator, never
across Filter and Project, so the duplication is real at any scale.

How the block actually works (verified against Spark 4.1's optimized
plans — the first r13 attempt was silently folded away, see below):

* PushPredicateThroughNonJoin pushes a filter below a Project iff
  EVERY project field is deterministic (`fields.forall(_.deterministic)`).
  The predicate's own determinism is irrelevant for Projects — a
  rand()-bearing filter condition still pushes through and still
  duplicates the derived expression. So the non-determinism MUST live
  in a projected column, not in the filter condition.
* Spark 4.1 constant-folds `rand() >= 0` to `true` (literal bounds on
  the rand distribution), and SimplifyConditionalsInPredicate rewrites
  `CASE WHEN p THEN cond ELSE false END` in predicate position into
  `p AND cond`, whose deterministic conjunct is then split off and
  pushed anyway. Both mechanisms together reduced the previous
  `WHEN rand() >= 0 THEN cond ELSE false` wrapper to a plain pushable
  filter. The arithmetic form below survives: `cast(cond as int) +
  rand() >= 1.0` is a single comparison (no CASE to rewrite, no
  conjunction to split) whose value cannot be bounds-folded without
  knowing `cond`.

Value identity of the taint: cond=true -> 1+rand in [1,2) -> true;
cond=false -> 0+rand in [0,1) -> false; cond=null -> null (dropped by
a filter, same as the bare condition). rand() < 1.0 strictly, and
1.0 + x >= 1.0 exactly for x >= 0, so there is no floating-point edge.

tests/test_plan_shape_r13.py pins the resulting plan shape (no
expensive expression inside any Filter node, taint present), so a
future Spark rule that learns to fold this form fails loudly instead
of silently reintroducing the duplication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nonpushable(cond: Column) -> Column:
    """Value-identical boolean taint: same truth table as ``cond`` but
    non-deterministic, so the optimizer may not constant-fold, split,
    or duplicate it.

    MUST be materialized as a *projected column* to block predicate
    pushdown (use :func:`filter_compute_once`); a taint applied
    directly inside ``.filter(...)`` still pushes through Projects,
    because Catalyst only checks the determinism of project fields.
    rand, not monotonically_increasing_id: the latter is rejected in
    streaming plans and split_valid runs inside the streaming ingest
    dataflow."""
    return (cond.cast("int") + F.rand()) >= F.lit(1.0)


def array_compute_once(arr: Column) -> Column:
    """Value-identical array taint for `explode(expensive_expr)` sites.

    Catalyst's InferFiltersFromGenerate synthesizes `size(e) > 0 AND
    isnotnull(e)` below every explode(e), and PushDownPredicates then
    re-inlines e's FULL defining expression into that filter — the
    optimizer-synthesized cousin of the duplication `nonpushable`
    guards against, so no filter-side guard can reach it. For the
    expensive generator arrays this engine explodes (5-gram shingle
    pipelines, winnowing fingerprints, zip_with bigram structs) the
    whole per-row pipeline runs up to 3x, and below a fanout
    repartition the duplicated copy lands in the UNSPLIT single-task
    scan stage (r13: winnow posting stage 0.88 → 0.23 s min, values
    hash-identical).

    The taint is a non-deterministic no-op slice — start index
    `1 + int(rand()*0)` is always 1, length Int.MaxValue returns the
    whole array, NULL in → NULL out, [] → [] — projected as a column,
    which (a) stops the inferred filter's pushdown through the
    projection, so it tests the MATERIALIZED attribute, and (b) cannot
    be constant-folded (rand()'s subtree is non-deterministic; the
    bounds-folding that killed `WHEN rand() >= 0` has no literal
    comparison to fold here).

    Apply ONLY where the generator expression is expensive: a global
    exclusion of InferFiltersFromGenerate was measured instead and
    REVERTED — it also suppresses the `isnotnull` scan pushdown the
    rule derives for cheap token explodes, costing dedup_minhash_lsh /
    dedup_simhash a consistent 0.1-0.2 s while the taint captures the
    full win (winnow 1.23 → 0.83 vs 0.88 excluded) with no
    collateral."""
    return F.slice(
        arr, F.lit(1) + (F.rand() * F.lit(0.0)).cast("int"), F.lit(2147483647)
    )


def filter_compute_once(df: DataFrame, cond: Column) -> DataFrame:
    """``df.filter(cond)`` that evaluates the expensive derived columns
    referenced by ``cond`` exactly once.

    The tainted condition is projected as a column (making the
    projection non-deterministic, which is what actually stops
    PushPredicateThroughNonJoin), filtered on, and dropped. When
    CollapseProject merges the taint into the projection that computes
    the derived columns, whole-stage codegen's subexpression
    elimination shares the duplicated subtree within that single
    operator; when it does not merge, the filter references a plain
    attribute. Either way no expression runs twice across a
    Filter/Project boundary, and the filter cannot sink below an
    exchange (locally: cannot single-task itself onto the unsplit
    scan side of the fanout repartition).

    Use ONLY for predicates over expensive derived columns: the guard
    also blocks legitimate pushdown of this filter toward scans, so a
    cheap predicate should stay pushable."""
    tag = "__keep_once__"
    return df.withColumn(tag, nonpushable(cond)).filter(F.col(tag)).drop(tag)
