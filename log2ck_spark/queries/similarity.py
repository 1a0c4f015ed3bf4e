"""Similarity search over the `embeddings` table (SURVEY.md §2 C3).

* `similarity_topk`: brute-force cosine top-k for a small query set —
  broadcast the queries, one scan of the corpus, per-partition heap via
  TakeOrdered. Exact, oracle-checked.
* `similarity_lsh`: random-hyperplane LSH bucketing — the scale path.
  Each vector gets a b-bit signature; candidates share a bucket in at
  least one of the hash tables. Approximate → rows-only check; recall
  vs the exact top-k is asserted in tests.

At 100 TB (10^10 vectors): brute force is one broadcast-join scan per
query batch — fine for ad-hoc q's; LSH turns it into a bucket-join that
touches ~1/2^bits of the corpus per table. An IVF variant would
replace random planes with k-means centroids (same join shape).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log2ck_spark.functions.vectors import (
    ORACLE_FINITE_VEC,
    as_double,
    cosine,
    finite_vec,
    plane_signatures,
)
from log2ck_spark.io import table_key, tbl
from log2ck_spark.queries import register

N_QUERIES = 5
TOP_K = 5


@register(
    "similarity_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE {ORACLE_FINITE_VEC}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k: broadcast the query vectors against one
    corpus scan; cosine is a codegen'd higher-order expression (no
    UDF); rank via window with (cos, neighbor_id) tie-break so the
    k-set is deterministic cross-engine."""
    e = tbl(spark, sf_dir, "embeddings").where(
        # NULL vectors (failed embedding jobs) are skipped, not
        # crashed on — the corpus is the non-NULL rows (--sparse)
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


_LSH_TABLES, _LSH_BITS = 4, 8
_TESTDATA_DIM = 64  # every /root/testdata embeddings table is 64-dim


# Per-process memo of the probed embedding WIDTH, keyed on the table's
# (path, mtime_ns, size) identity — exactly the schema memo's contract
# (io._SCHEMA_CACHE): the width is a schema-level property parquet
# cannot express in its footer, it invalidates on any rewrite of the
# table, and the memo dies with the process, so every bench/oracle
# invocation still probes each table once. Before r14 every LSH query
# CONSTRUCTION re-ran the probe — an O(1) but job-launching first()
# (~0.1 s × 3 bench iterations × 2 queries).
_DIM_CACHE: dict = {}


def _corpus_dim(e: DataFrame, cache_key: tuple | None = None) -> int:
    """Embedding width read from one NON-DEGENERATE corpus row (bounded
    1-row pull; the size() predicate pushes into the same scan, so this
    is still a take(1) that stops at the first qualifying row).
    Probing row 1 unconditionally (the r6 advisor finding) meant a
    corpus whose FIRST row happened to carry a NULL/empty embedding got
    _TESTDATA_DIM hyperplanes even when the rest of the corpus was
    non-64-dim — a runtime dot-product dimension error (or silently
    wrong LSH signatures) instead of the intended degenerate-only
    fallback. Falls back to _TESTDATA_DIM only when NO row has a
    non-empty embedding: there the plane dimensionality is irrelevant
    (every signature path drops empty vectors), but the hyperplane
    constructor still needs a positive dim.

    `cache_key` (io.table_key of the underlying table) memoizes the
    probed width per table identity; None always probes."""
    if cache_key is not None and cache_key in _DIM_CACHE:
        return _DIM_CACHE[cache_key]
    row = (
        e.filter(F.size("v") > 0).select(F.size("v").alias("d")).first()
    )
    d = row.d if row is not None and row.d and row.d > 0 else _TESTDATA_DIM
    if cache_key is not None:
        _DIM_CACHE[cache_key] = d
    return d


def _lsh_sig_sql(planes: list[list[float]], t: int, bits: int) -> str:
    """One table's bucket id as a DuckDB expression: bit b set iff
    v · plane[t*bits+b] > 0 (the exact sign test the Arrow UDF runs)."""
    terms = [
        "CASE WHEN list_dot_product(v, ["
        + ",".join(repr(x) for x in planes[t * bits + b])
        + f"]) > 0 THEN {1 << b} ELSE 0 END"
        for b in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _lsh_oracle() -> str:
    """Full SQL replay of similarity_lsh: the hyperplanes are a pure
    function of (dim, n_planes, seed), so for the fixed 64-dim test
    corpus they can be inlined as literals and DuckDB reproduces the
    identical bucketing, candidate set, rescoring, and top-k — which
    upgrades this query from a rows-only check to a value check."""
    planes = _hyperplanes(_TESTDATA_DIM, _LSH_TABLES * _LSH_BITS)
    sig_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_lsh_sig_sql(planes, t, _LSH_BITS)} AS sig FROM e"
        for t in range(_LSH_TABLES)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE {ORACLE_FINITE_VEC}),
    sigs AS (
      {sig_selects}
    ),
    q AS (SELECT vec_id AS query_id, tbl, sig FROM sigs WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
      FROM sigs s JOIN q ON s.tbl = q.tbl AND s.sig = q.sig
      WHERE s.vec_id <> q.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             ROUND(list_cosine_similarity(eq.v, en.v), 6) AS cos
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e en ON en.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """


@register("similarity_lsh", oracle=_lsh_oracle())
def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 4 tables x 8-bit signatures.

    sig_t(v) = bits of sign(v·h_i); same (table, sig) ⇒ candidate.
    Exact cosine re-scored within buckets, top-k per query. Planes are
    seeded-numpy constants captured by the signature UDF — shipped to
    every task with the closure, no shuffle to build the index; the
    signatures themselves are one Arrow-batched matmul per task
    (functions.vectors.plane_signatures). The oracle replays the SAME
    planes as inlined SQL literals (see _lsh_oracle), making this ANN
    path value-checked, not rows-only."""
    e = tbl(spark, sf_dir, "embeddings", fanout=True).where(
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    dim = _corpus_dim(e, table_key(sf_dir, "embeddings"))
    n_tables, bits = _LSH_TABLES, _LSH_BITS
    planes = _hyperplanes(dim, n_tables * bits)

    # all n_tables signatures in ONE Arrow-batched matmul per task
    # (posexplode index = table id) — see functions.vectors. Only the
    # IDS flow into the bucket join: the candidate dedup used to run
    # .distinct() over full 64-double payloads, doubling the candidate
    # shuffle width — now distinct is over two longs and the payloads
    # are re-attached afterwards.
    sig_udf = plane_signatures(planes, bits)
    buckets = e.select("vec_id", F.posexplode(sig_udf("v")).alias("table", "sig"))

    q_sigs = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table", "sig"
    )
    cand_ids = (
        buckets.join(F.broadcast(q_sigs), ["table", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # candidate set is bounded by |queries| x bucket occupancy — small;
    # broadcast it into ONE corpus scan for the payloads, then attach
    # the (broadcastable) query vectors.
    qvecs = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = (
        e.join(F.broadcast(cand_ids), e.vec_id == cand_ids.neighbor_id)
        .join(F.broadcast(qvecs), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


_DEDUP_LSH_TABLES, _DEDUP_LSH_BITS, _DEDUP_LSH_SEED = 16, 4, 7
_DEDUP_LSH_TAU = 0.4


def _dedup_lsh_oracle() -> str:
    """Full SQL replay of dedup_embedding_lsh (same recipe that
    upgraded similarity_lsh from rows-only to value-checked in r4):
    the 16x4 seed-7 hyperplanes are a pure function of
    (dim, n_planes, seed), so DuckDB reproduces the identical
    bucketing, candidate pair set, and exact-cosine verification —
    recall vs brute force is irrelevant to the check because the
    oracle replays the SAME approximate algorithm."""
    planes = _hyperplanes(
        _TESTDATA_DIM, _DEDUP_LSH_TABLES * _DEDUP_LSH_BITS, seed=_DEDUP_LSH_SEED
    )
    sig_selects = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl,"
        f" {_lsh_sig_sql(planes, t, _DEDUP_LSH_BITS)} AS sig FROM e"
        for t in range(_DEDUP_LSH_TABLES)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE {ORACLE_FINITE_VEC}),
    sigs AS (
      {sig_selects}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM sigs a
      JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    scored AS (
      -- zero-norm guard mirroring the Spark kernel (norms==0 -> 1.0,
      -- so cosine 0): DuckDB's list_cosine_similarity yields NaN for
      -- a zero vector and DuckDB orders NaN above every value, so an
      -- unguarded NaN >= tau would emit pairs Spark suppresses.
      SELECT c.vec_a, c.vec_b,
             CASE WHEN list_dot_product(ea.v, ea.v) = 0
                    OR list_dot_product(eb.v, eb.v) = 0 THEN 0
                  ELSE ROUND(list_cosine_similarity(ea.v, eb.v), 6)
             END AS cos
      FROM cand c
      JOIN e ea ON ea.vec_id = c.vec_a
      JOIN e eb ON eb.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, cos FROM scored WHERE cos >= {_DEDUP_LSH_TAU}
    """


@register("dedup_embedding_lsh", oracle=_dedup_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-CORPUS embedding near-dup at scale: hyperplane-LSH bucket
    the whole table, generate candidate pairs only WITHIN buckets,
    exact-cosine verify the candidates (precision 1.0 by construction;
    recall vs the exact join is seed-dependent and asserted in tests).

    This is the scale path `queries.dedup.dedup_embedding` (exact,
    anchor-bounded) points at: no corpus×corpus join anywhere — the
    only shuffles are the bucket grouping (uniform 64-bit-ish keys)
    and the candidate-payload joins sized by |candidates|. With
    t tables × b bits, a bucket holds ~n/2^b vectors; per-bucket pair
    expansion is the classic LSH candidate cost.

    Scale honesty: bits must grow with log(n) to keep buckets bounded,
    and how many tables that costs is THRESHOLD-driven. The fixture's
    0.4 threshold sits at a 66° angle (per-bit agreement 0.63), forcing
    coarse 4-bit buckets — fine at test scale, O(n²/2^b) beyond it.
    Production near-dup thresholds (cos ≥ 0.9, 26°, per-bit 0.86) keep
    recall ≈ 0.94 at 16 bits × 32 tables with tiny buckets — that
    configuration scales to 10^9 vectors; for wide-angle thresholds use
    IVF (similarity_ivf's shape) or an ANN graph instead of LSH.
    Value-checked: the seeded planes inline as SQL literals and the
    oracle replays the identical pipeline (see _dedup_lsh_oracle);
    brute-force ground truth still drives the recall test.

    Execution (r5): the verify half runs as ONE vectorized cosine
    matrix per bucket (Arrow-batched `applyInPandas`, the
    dedup_semantic kernel) instead of materialize-candidates →
    distinct → two payload joins → per-pair cosine. The wide-angle
    fixture makes ~2M raw candidate rows from 2k vectors at sf0.1;
    the kernel never materializes them — each bucket's pairs exist
    only inside a numpy matmul, and only true dups (plus one
    post-verify `distinct` over the far smaller survivor set) hit the
    shuffle. Measured 5.7s → 1.0s at sf0.1. Same distributed shape:
    postings shuffle once to their (table, sig) bucket; buckets stay
    bounded because bits grow with log(n)."""
    import pandas as pd

    threshold = _DEDUP_LSH_TAU
    e = tbl(spark, sf_dir, "embeddings", fanout=True).where(
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    dim = _corpus_dim(e, table_key(sf_dir, "embeddings"))
    # Recall-first banding: the 0.4 threshold sits at a wide angle
    # (66°), so per-bit agreement is only ~0.63 — few bits per table,
    # many tables (16×4 ⇒ theoretical recall ≈ 0.94, measured ~0.9 at
    # sf0.01; 8×6 measured 0.41). Coarser buckets cost candidate
    # expansion (n/16 per bucket), the price of a low threshold.
    n_tables, bits = _DEDUP_LSH_TABLES, _DEDUP_LSH_BITS
    sig_udf = plane_signatures(
        _hyperplanes(dim, n_tables * bits, seed=_DEDUP_LSH_SEED), bits
    )
    postings = e.select(
        "vec_id", "v", F.posexplode(sig_udf("v")).alias("table", "sig")
    )

    def _bucket_dup_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one bucket: exact pairwise cosine via a single matmul,
        # emitting only pairs at/above tau. Rounds to 6 decimals to
        # match functions.vectors.cosine and the oracle's ROUND.
        ids = pdf["vec_id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy())
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = np.round((mat / norms) @ (mat / norms).T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        a, b = ids[iu[hit]], ids[ju[hit]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cos": sims[iu, ju][hit],
            }
        )

    return (
        postings.groupBy("table", "sig")
        .applyInPandas(_bucket_dup_pairs, "vec_a bigint, vec_b bigint, cos double")
        # a pair sharing several buckets is emitted once per bucket
        # with an identical rounded cosine — dedup the survivors only
        .distinct()
    )


_IVF_K, _IVF_NPROBE = 16, 4

# DuckDB ORDER BY expression matching the Spark-side seed selection —
# the single source of truth for "smallest md5(vec_id), vec_id" shared
# by _ivf_oracle and semantic._semdedup_oracle. A tie-break/cast change
# here changes both replays together.
SEED_ORDER_SQL = "md5(CAST(vec_id AS VARCHAR)), vec_id"


def seed_centroid_rows(e: DataFrame, k: int) -> list:
    """The k corpus rows with the SMALLEST md5(vec_id): deterministic,
    layout-independent, and a pure function of the table — the
    SQL-replayable coarse-quantizer selection shared by similarity_ivf
    and dedup_semantic (SEED_ORDER_SQL is its DuckDB twin).
    orderBy+limit compiles to TakeOrderedAndProject — per-task k-row
    heaps, bounded driver collect."""
    return (
        e.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("hh"))
        .orderBy("hh", "vec_id")
        .limit(k)
        .collect()
    )


def centroid_scores_sql(
    cents: list, id_name: str, v_col: str = "v", integer: bool = False
) -> str:
    """SQL text for `array<struct<d2, {id_name}>>`: the squared
    distance from `v_col` to each of the k LITERAL centroids, tagged
    with the centroid index — the k-way reduction as ONE per-row
    expression (r13, guide §2.4). The previous shape crossJoined the
    corpus with a broadcast k-row centroid table and reduced the n x k
    rows back down with a groupBy(vec_id) min_by (or a
    Window-partitionBy(vec_id) row_number for top-nprobe): a k-fold
    row inflation pushed through a full exchange (and a per-group
    sort) for what is a per-row argmin. Here the nearest centroid is
    `array_min(expr)` and the nprobe nearest are
    `slice(array_sort(expr), 1, nprobe)` — struct ordering compares
    (d2, id) lexicographically, the exact min_by/row_number tie-break
    — evaluated inside the corpus scan, no inflation, no exchange.

    The distance arithmetic is element-for-element the fold the old
    broadcast-join expression ran (zip_with diff-square, left-to-right
    aggregate), so every d2 is bit-identical. Float centroid literals
    are repr() round-trips with the D suffix — Double.parseDouble of a
    shortest-round-trip repr returns the same IEEE double, so the
    inlined seeds equal the collected ones exactly. The whole array
    parses in ONE F.expr call (the r13 py4j lesson: thousands of
    chained Column ops cost seconds at plan-build time)."""
    if integer:
        rows = ",".join(
            "array(" + ",".join(f"{int(x)}L" for x in row) + ")"
            for row in cents
        )
        zero = "0L"
    else:
        rows = ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in row) + ")"
            for row in cents
        )
        zero = "0.0D"
    return (
        f"transform(array({rows}), (c, i) -> named_struct("
        f"'d2', aggregate(zip_with({v_col}, c, (a, b) -> (a - b) * (a - b)), "
        f"{zero}, (acc, x) -> acc + x), '{id_name}', i))"
    )


def _ivf_oracle() -> str:
    """Full SQL replay of similarity_ivf: the coarse quantizer is the
    k corpus vectors with the smallest md5(vec_id) — a deterministic,
    layout-independent selection DuckDB reproduces exactly — so the
    entire IVF pipeline (seed lists, nearest-list assignment, per-query
    nprobe probing, exact-cosine re-scoring, top-k) replays
    cross-engine. Near-tie ordering on d2 is float-noise safe: an
    engine-order flip needs two distances within ~1e-12, and exact ties
    (duplicate vectors) break on list_id in both engines."""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE {ORACLE_FINITE_VEC}),
    seeds AS (
      SELECT v AS c, CAST(ROW_NUMBER() OVER (
               ORDER BY {SEED_ORDER_SQL}
             ) - 1 AS INTEGER) AS list_id
      FROM e ORDER BY {SEED_ORDER_SQL} LIMIT {_IVF_K}
    ),
    scored AS (
      SELECT e.vec_id, e.v, s.list_id,
             POWER(list_distance(e.v, s.c), 2) AS d2
      FROM e CROSS JOIN seeds s
    ),
    assigned AS (
      SELECT vec_id, v, list_id FROM (
        SELECT vec_id, v, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, list_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, v AS qv, list_id FROM (
        SELECT vec_id, v, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, list_id) AS rn
        FROM scored WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {_IVF_NPROBE}
    ),
    ranked AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qv, a.v), 6) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY ROUND(list_cosine_similarity(p.qv, a.v), 6) DESC,
                        a.vec_id
             ) AS rank
      FROM probes p JOIN assigned a USING (list_id)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """


@register("similarity_ivf", oracle=_ivf_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse quantizer -> assign each vector
    to its nearest centroid (one distributed pass, centroids as
    broadcast literals) -> probe the nprobe closest centroid lists per
    query -> exact cosine re-score within the probed lists.

    The coarse quantizer is the k corpus vectors with the SMALLEST
    md5(vec_id) — a deterministic hash-sample of real data points (the
    random/sampled coarse-quantizer IVF variant; FAISS's k-means
    training likewise just refines a random data-vector init). Chosen
    over Lloyd-trained centroids deliberately: centroid selection
    becomes a pure function of the table that DuckDB replays, which
    upgrades this ANN path from a rows-only check to a FULL value
    check (see _ivf_oracle) at the cost of somewhat less balanced
    lists. `embedding_kmeans` remains the genuine Lloyd's-trained
    clustering operator.

    Scale shape: quantizer selection is a TakeOrdered over md5 keys (a
    k-row driver collect, k=16; ~sqrt(n) in production); assignment
    and probing are single-scan column expressions; each query touches
    nprobe/k of the corpus instead of all of it. Recall vs brute force
    is asserted in tests."""
    e = tbl(spark, sf_dir, "embeddings").where(
        # NULL vectors (failed embedding jobs) are skipped, not
        # crashed on — the corpus is the non-NULL rows (--sparse)
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    k, nprobe = _IVF_K, _IVF_NPROBE
    seed_rows = seed_centroid_rows(e, k)
    # a corpus smaller than k lists: one list per vector is the
    # degenerate-but-correct quantizer; nprobe shrinks with it.
    k = len(seed_rows)
    nprobe = min(nprobe, k)
    if not seed_rows:
        # empty corpus: no seeds, no result — schema-preserving empty
        # frame (the literal-centroid expression below cannot type an
        # empty array)
        return e.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(0.0).alias("cos"),
            F.lit(1).alias("rank"),
        ).filter(F.lit(False))

    # r13 (guide §2.4): nearest-list assignment and per-query probing
    # as per-row expressions over the k LITERAL centroids — the old
    # corpus x k crossJoin + groupBy(vec_id) min_by (and the window
    # top-nprobe over the same inflated frame) shuffled k rows per
    # vector to reduce a per-row argmin; see centroid_scores_sql.
    scores = F.expr(centroid_scores_sql([r.v for r in seed_rows], "list_id"))
    assigned = e.select(
        "vec_id", "v", F.array_min(scores)["list_id"].alias("list_id")
    )
    probes = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(F.slice(F.array_sort(scores), 1, nprobe)).alias("s"),
        )
        .select("query_id", "qv", F.col("s.list_id").alias("list_id"))
    )
    cand = assigned.join(F.broadcast(probes), "list_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


@register(
    "embedding_centroid",
    oracle="""
    WITH ex AS (
      SELECT label, g.pos AS pos,
             TRY_CAST(CAST(CAST(embedding[g.pos] AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9)) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) g
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           ROUND(CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) / COUNT(x), 6)
             AS centroid
    FROM ex GROUP BY label, pos
    """,
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (class prototypes / the k-means
    update step), emitted long-form as (label, pos, centroid).

    posexplode + two-phase hash aggregate: the shuffle carries one
    partial row per (partition, label, dim) — at 10^10 vectors × 64
    dims the map-side combine reduces the shuffle to
    labels × dims × partitions rows. Sums go through exact decimal so
    the result is partitioning-independent (functions/numeric.py);
    long format (not array) keeps the oracle hash order-insensitive.
    This is the distributed mean-update primitive similarity_ivf's
    driver-side k-means would use at full scale."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(as_double("embedding")).alias("pos0", "x")
    )
    d = F.col("x").try_cast("decimal(18,9)")
    return e.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos")).agg(
        F.round(F.sum(d).cast("double") / F.count(d), 6).alias("centroid")
    )
