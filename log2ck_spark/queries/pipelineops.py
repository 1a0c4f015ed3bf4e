"""Training-data-pipeline operators beyond the reference surface:
as-of join, bucketed range join, near-dup clustering (connected
components), and deterministic hash sampling.

The reference (hisune/log2ck) has no query engine of its own —
`readme.md:106-125` delegates everything to ClickHouse — so these are
part of the declared north-star extension set (BASELINE.json): the
operations a large-scale corpus pipeline runs between ingestion and
training.

Scale notes per operator are in each docstring; the common theme is
that none of them is a naive O(n²) join — as-of is one shuffle + one
window pass, the range join buckets time so each row only meets its
neighboring buckets, and clustering iterates a small edge list, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log2ck_spark.functions.numeric import md5_bucket
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# As-of join (the classic "latest event at or before t" operator)
# --------------------------------------------------------------------------


@register(
    "asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, c.click_id,
           date_diff('microsecond', c.ts, p.ts) AS gap_us
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every `purchase` event, the most recent `click`
    by the same user at or before its timestamp (attribution lookup).

    Spark has no ASOF JOIN operator; the naive formulation is an
    inequality self-join (O(clicks × purchases) per user) or a
    per-user collect. This implementation is the scale-correct shape:
    UNION both sides tagged, one shuffle on user_id, one window pass
    carrying the last non-null click forward
    (`last(click_id, ignorenulls)` over rows UNBOUNDED PRECEDING).
    Cost is sort-by-(user, ts) — identical asymptotics to the
    merge-based ASOF implementations in kdb/QuestDB/DuckDB, but
    expressed with stock window functions so Catalyst/AQE still own
    the physical plan. Clicks are pre-deduped per (user, ts) keeping
    MAX(event_id) so ties are deterministic cross-engine.

    Ordering within a timestamp puts clicks (side=0) before purchases
    (side=1): "at or before" includes a click at the exact purchase
    ts. The DuckDB oracle uses its native ASOF LEFT JOIN — same
    semantics, independent implementation.
    """
    ev = tbl(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", F.lit(0).alias("side"),
                "click_id", F.lit(None).cast("bigint").alias("purchase_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "purchase_id",
        "user_id",
        "ts",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last(
            F.when(F.col("click_id").isNotNull(), F.unix_micros("ts")),
            ignorenulls=True,
        ).over(w).alias("click_us"),
    )
    return carried.filter(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_micros("ts") - F.col("click_us")).alias("gap_us"),
    )


# --------------------------------------------------------------------------
# Bucketed range join (events within a time window of anchor events)
# --------------------------------------------------------------------------

_RANGE_S = 60  # window half-width in seconds


@register(
    "range_join_bucketed",
    oracle=f"""
    SELECT e.event_id, COUNT(n.event_id) AS n_neighbors,
           ROUND(COALESCE(SUM(n.value), 0), 3) AS neighbor_value
    FROM events e
    LEFT JOIN events n
      ON n.ts BETWEEN e.ts - INTERVAL {_RANGE_S} SECOND
                  AND e.ts + INTERVAL {_RANGE_S} SECOND
     AND n.event_id <> e.event_id
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each `error` event, count + sum all events
    within ±60 s (incident-context gathering).

    A raw inequality join is O(n²) — Spark would pick
    BroadcastNestedLoopJoin and die at scale. Bucketing time into
    2×60 s buckets makes it an equi-join: each anchor joins only rows
    in its own and adjacent buckets (every |Δt| ≤ 60 s pair shares a
    bucket or sits in neighbors), then the exact predicate filters
    inside the bucket. Shuffle cost is 3× the probe side (the three
    bucket replicas), not n²; bucket keys are uniform in time so no
    skew. This is the standard interval-join strategy (Flink's
    interval join, DuckDB's IEJoin literature) expressed as DataFrame
    ops.
    """
    bucket_s = 2 * _RANGE_S
    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "event_type", "value",
        F.unix_micros("ts").alias("us"),
        (F.unix_micros("ts") / F.lit(bucket_s * 1_000_000))
        .cast("bigint").alias("bkt"),
    )
    anchors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"), F.col("us").alias("a_us"), "bkt"
    )
    # replicate anchors into the 3 buckets their window can touch
    probe = anchors.select(
        "a_id", "a_us",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    pairs = probe.join(ev, "bkt").filter(
        (F.col("event_id") != F.col("a_id"))
        & (F.abs(F.col("us") - F.col("a_us")) <= F.lit(_RANGE_S * 1_000_000))
    )
    counted = pairs.groupBy("a_id").agg(
        F.count("*").alias("n_neighbors"),
        F.round(F.sum("value"), 3).alias("neighbor_value"),
    )
    # LEFT-join semantics: anchors with zero neighbors still appear
    return (
        anchors.select(F.col("a_id").alias("event_id"))
        .join(counted.withColumnRenamed("a_id", "event_id"), "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
            F.coalesce("neighbor_value", F.lit(0.0)).alias("neighbor_value"),
        )
    )


# --------------------------------------------------------------------------
# Near-dup clustering: connected components over similarity pairs
# --------------------------------------------------------------------------


def _jaccard_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log2ck_spark.queries.dedup import (
        JACCARD_THRESHOLD,
        _exact_jaccard_pairs,
        _shingled,
    )

    return _exact_jaccard_pairs(
        _shingled(spark, sf_dir), JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")


def _min_label_cc(
    spark: SparkSession, edges: DataFrame, n_edges: int
) -> tuple[DataFrame, bool, int]:
    """Min-label propagation over a SYMMETRIC edge list → (labels,
    converged, rounds). labels = (doc_id, label) for every node that
    occurs in an edge, label = the component's minimum doc_id.

    r14 restructure (guide §2.4 — remove shuffles outright, measured
    round-by-round at sf0.1):

    * Round 1 is ONE aggregation straight off the edge list: with every
      label still its own doc_id, "min over neighbor labels" IS "min
      over neighbor ids", so label₁(a) = least(a, MIN(doc_b)) — the old
      shape paid an initial-labels distinct (an exchange) plus a
      join+agg+join round for the identical result. The groupBy key set
      is exactly the node set, so the init frame disappears entirely.
    * Rounds 2+ drop the second join: the old shape joined neighbor
      minima BACK to labels to compute least(label, nmin) and a
      `changed` flag. Instead the node's own label rides the SAME
      join+agg as a self-loop (labels doubling as (a, a) edges joined
      against themselves), so updated(a) = MIN over {label(a)} ∪
      {label(b): b ∈ N(a)} is one join + one agg.
    * Convergence via the label-sum invariant, not a changed-count:
      labels only ever DECREASE, so any change strictly decreases
      SUM(label). One DECIMAL(38,0) aggregate (exact — no int64
      overflow at 10^10 ids × 10^10 nodes, no ANSI crash) per round is
      the whole check, and it is the action that materializes the
      round's lazy checkpoint — one job per round, same as before,
      with one join and one exchange less inside it.

    The propagation joins shuffle a graph that is orders smaller than
    the corpus, but they inherit the session's shuffle-partition count
    (sized for corpus-scale aggregations). Size the loop's shuffles to
    the GRAPH instead — n_edges is already on the driver — and restore
    the session setting afterwards (the returned plan's consumers
    execute under the caller's config). ~100k edges/partition: 1
    partition on the fixture, thousands at 100 TB. The per-round sum
    aggregates are the only actions that run under the override."""
    sess_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(n_edges // 100_000 + 1)
    )
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    converged = False
    rounds = 0
    try:
        labels = (
            edges.groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("doc_b").alias("nmin"))
            .select(
                "doc_id",
                F.least(F.col("doc_id"), F.col("nmin")).alias("label"),
            )
            # lazy: the sum right below is the materializing action, so
            # each round runs ONE job (eager checkpoint + a separate
            # convergence action was 2 jobs/round).
            .localCheckpoint(eager=False)
        )
        if n_edges == 0:
            # empty graph: the (empty) round-1 frame is already the
            # fixpoint — don't spend jobs proving it.
            return labels, True, 1
        prev_sum = labels.agg(label_sum).first().s
        rounds = 1
        for _ in range(15):  # with round 1: the same 16-round diameter cap
            prop = edges.unionByName(
                # self-loop rows: carry each node's OWN label through
                # the same join+agg, replacing the old join-back
                labels.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                )
            )
            # rename the join key instead of referencing labels.doc_id:
            # labels sits on BOTH sides (inside prop's union and as the
            # join's right side), and name-based resolution over
            # disjoint column names sidesteps the self-join attribute
            # ambiguity that plan-bound references can hit.
            labels = (
                prop.join(
                    labels.withColumnRenamed("doc_id", "nbr"),
                    F.col("doc_b") == F.col("nbr"),
                )
                .groupBy(F.col("doc_a").alias("doc_id"))
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)
            )
            new_sum = labels.agg(label_sum).first().s
            rounds += 1
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sess_parts)
    return labels, converged, rounds


@register(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, greatest(len(toks) - 4, 0) + 1)]) AS s
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ), walk(doc_id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.doc_id
    )
    SELECT doc_id, MIN(label) AS cluster_id,
           CAST(doc_id = MIN(label) AS INTEGER) AS is_canonical
    FROM walk GROUP BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-Jaccard
    pair graph, labeling every document with its cluster's minimum
    doc_id. `is_canonical=1` marks the survivor — filtering on it is
    the "keep one per duplicate cluster" step an actual dedup pipeline
    ends with (pairs alone don't dedup: A~B, B~C must collapse to one
    cluster even if A~C was never emitted).

    Implementation: iterative min-label propagation (the standard
    large-graph CC algorithm — Kiveris et al.'s hash-to-min family).
    Labels live on nodes; each round every node takes the min of its
    own and its neighbors' labels; converges in O(component diameter)
    rounds — near-dup clusters are tiny and dense, so 2-4 rounds in
    practice, each round = one join + one aggregate on the EDGE list
    (thousands of rows), never the corpus. The driver-side loop reads
    back ONE scalar per round (the changed-label count) — the data
    never leaves executors; this is the documented exception where
    iterative algorithms need a convergence check.

    The DuckDB oracle computes the same fixpoint declaratively with a
    recursive CTE (reachability + MIN over reachable labels).
    """
    # materialize the (small) edge list once and truncate its lineage —
    # every round re-reads it, and without truncation round N's plan
    # contains N copies of the whole shingle/PPJoin pipeline, which
    # Catalyst re-optimizes from scratch each iteration (measured 5x
    # slower). localCheckpoint is the standard iterative-algorithm move
    # (same role as GraphX's periodic checkpoint). Checkpoint BEFORE
    # the symmetric-closure union: referencing the un-checkpointed
    # edges twice duplicated the whole PPJoin subtree inside the
    # checkpoint job (candidate join + verify ran twice — the r3
    # bench regression); the swap projection over the checkpointed
    # half is free.
    half = _jaccard_edges(spark, sf_dir).localCheckpoint(eager=True)
    # size-adaptive narrowing: the duplicate-pair graph is tiny
    # relative to the corpus (hundreds of edges at sf0.1, millions at
    # 100 TB — either way orders below the doc count), but it inherits
    # the PPJoin's full partitioning, so every propagation round pays
    # 32 near-empty tasks per stage. Coalesce (narrow, no shuffle —
    # the count is free on the checkpointed RDD) to ~100k edges per
    # partition, floor 1: at cluster scale this keeps thousands of
    # partitions, on the fixture it collapses scheduling overhead.
    n_edges = half.count()
    half = half.coalesce(max(1, min(half.rdd.getNumPartitions(),
                                    n_edges // 100_000 + 1)))
    edges = half.unionByName(
        half.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )

    # iterate ONLY over nodes that occur in an edge: at 10^10 docs the
    # duplicate-pair graph touches a small fraction of the corpus, and
    # propagating labels across isolated singletons would make every
    # round a full-corpus join for nothing. Singletons rejoin as
    # self-labeled clusters in one union at the end.
    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    labels, converged, _rounds = _min_label_cc(spark, edges, n_edges)
    if not converged:
        # Returning labels from a non-converged propagation would emit
        # SPLIT clusters as if they were final — fail loudly instead.
        # 16 rounds = component diameter 2^? no: plain min-label moves
        # one hop/round, so this trips on a >16-hop duplicate chain —
        # pathological for near-dup graphs, and the right response is a
        # bigger cap or hash-to-min doubling, not silent truncation.
        raise RuntimeError(
            "dedup_clusters: label propagation did not converge within "
            "16 rounds (duplicate-chain diameter too large)"
        )

    # labels is orders smaller than the corpus: broadcast the anti-join
    # build side so the singleton pass is one corpus scan, no shuffle.
    singletons = docs.join(
        F.broadcast(labels.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("label"))
    return labels.unionByName(singletons).select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).cast("int").alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling (reproducible corpus subsetting)
# --------------------------------------------------------------------------

_SAMPLE_PCT = 10  # keep ~10%


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          % 100 < {_SAMPLE_PCT}
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample keyed on md5(doc_id) — the
    reproducible train/holdout split a data pipeline needs.
    `df.sample()` re-draws per run and per partitioning; a
    content-keyed hash makes membership a pure function of the row, so
    the same doc lands in the same split on any cluster, any day, at
    any scale — and downstream incremental runs see a stable subset.
    md5 (not xxhash64) because it is bit-identical across engines: the
    DuckDB oracle reproduces the exact membership. One narrow filter,
    no shuffle; Catalyst pushes nothing to parquet (hash of a column)
    but the scan stays a single pass."""
    d = tbl(spark, sf_dir, "documents")
    bucket = md5_bucket("doc_id", 100, hex_digits=4)
    return d.filter(bucket < _SAMPLE_PCT).select(
        "doc_id", "lang", "source"
    )


# --------------------------------------------------------------------------
# Per-group top-k (the grouped flavor of B9)
# --------------------------------------------------------------------------

_K = 3


@register(
    "topk_per_group",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rnk
      FROM events
    )
    SELECT event_type, event_id, value, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_K}
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows PER GROUP (highest-value events per type) via
    row_number over a (group, order) window — the grouped counterpart
    of B9's global TakeOrderedAndProject. One shuffle on the group
    key; with AQE the per-partition sort is the only extra cost. At
    skew (one giant group) the window sort is the bottleneck — the
    fix is a two-phase top-k (per-partition heap, then re-rank the
    k×partitions survivors), which `topk_order_limit` demonstrates
    globally. Deterministic tie-break on event_id."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        tbl(spark, sf_dir, "events")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _K)
        .select("event_type", "event_id", "value", "rnk")
    )


@register(
    "topk_per_group_twophase",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rnk
      FROM events
    )
    SELECT event_type, event_id, value, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_K}
    """,
)
def topk_per_group_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k that survives a skewed group: phase 1 ranks within
    (group, input-partition) — parallelism = #partitions even if one
    group owns 99% of rows — and keeps k rows per (group, partition);
    phase 2 re-ranks the surviving k×P rows per group. Result is
    identical to the single-window formulation (`topk_per_group`, same
    oracle): any global top-k row is necessarily a top-k row of its own
    partition. This is the window-function analog of partial
    aggregation — the global sort of a hot group never happens."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "_pid", F.spark_partition_id()
    )
    w1 = Window.partitionBy("event_type", "_pid").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    survivors = (
        ev.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= _K)
        .drop("_r1", "_pid")
    )
    w2 = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= _K)
        .select("event_type", "event_id", "value", "rnk")
    )
