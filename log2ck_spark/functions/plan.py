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
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nonpushable(cond: Column) -> Column:
    """Wrap a boolean filter condition so the optimizer cannot push it
    below the projection computing its inputs — the guide-§4.4 remedy
    (mark non-deterministic so the optimizer may not duplicate or
    reorder) spelled for built-in expressions: `rand()` is in [0, 1)
    by construction so the value is exactly `cond`, but the
    non-determinism pins the filter in place. rand, not
    monotonically_increasing_id, because the latter is rejected in
    streaming plans and several callers run inside the streaming
    ingest dataflow. The WHEN-fusion matters: `cond & (rand() >= 0)`
    is a splittable conjunction and Catalyst pushes the deterministic
    conjunct anyway.

    Use ONLY on predicates over expensive derived columns, directly
    above the projection that computes them — it also blocks
    legitimate pushdown of this filter past joins/scans below, so a
    cheap predicate should stay pushable."""
    return F.when(F.rand() >= 0, cond).otherwise(F.lit(False))
