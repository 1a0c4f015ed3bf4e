"""Semantic (embedding-space) corpus operators: k-means clustering of
the embedding table and SemDeDup-style cluster-local semantic
deduplication (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023 — public paper).

Both follow the IVF recipe already in similarity.py: train a small
quantizer on a deterministic driver-side hash-sample, broadcast the
centroids, and keep every corpus-sized step distributed (one
assignment scan; pair expansion only WITHIN clusters). Both carry
FULL DuckDB value oracles: dedup_semantic via deterministic
seed-vector Voronoi cells, embedding_kmeans via fixed-point Lloyd
training whose integer arithmetic the oracle replays bit-for-bit
(unrolled iteration CTEs); tests/test_semantic.py adds determinism,
convergence, and precision/recall against brute-force ground truth.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.vectors import (
    ORACLE_FINITE_VEC,
    as_double,
    finite_vec,
)
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

_K_MAX = 64  # cluster cap for the fixture (~sqrt(n) in production)
_CELL_TARGET = 32  # aim for ~32 members per cell: k = n / 32, capped
_SEMDEDUP_TAU = 0.4  # same near-dup threshold as dedup_embedding

# Fixed-point Lloyd's parameters. Q is a POWER OF TWO so x * Q is an
# exact IEEE-754 operation (pure exponent shift, identical in Spark,
# numpy and DuckDB); FLOOR of an identical double is identical, so the
# quantization z = floor(v * Q) is bit-reproducible across engines.
# From there every training step is int64 arithmetic: distances are
# integer sums (order-independent, no float-accumulation drift) and
# centroid updates are integer division — which is what lets the
# oracle replay the ENTIRE training loop value-for-value. Q = 2^20
# keeps ~6 decimal digits of the unit-scale embedding components; for
# ||v||~1, 64-dim fixtures d2 <= 64*(2*0.6*Q)^2 ~ 1e14 and corpus
# inertia sums stay far inside int64 (switch the final sum to
# decimal(38,0) past ~10^4x this SF).
#
# _OFFSET makes every quantized component non-negative: numpy's `//`
# FLOORS but DuckDB's `//` TRUNCATES toward zero (measured: -7//2 is
# -4 vs -3), so centroid means of negative sums would drift one ulp
# apart. On non-negative ints the two coincide; the shift is exact
# (integer), cancels in every difference, and divides out exactly in
# the mean (floor((S + n*O)/n) = O + floor(S/n)), so distances,
# assignments, and inertia are identical to the unshifted floor-
# division semantics. 2^24 covers |x| <= 16 at Q=2^20.
_Q = 1 << 20
_OFFSET = 1 << 24
_LLOYD_ITERS = 4  # unrolled 1:1 in the oracle SQL — keep in sync
_SAMPLE_CAP = 512  # driver-side training sample (documented IVF bound)


def _fixedpoint_lloyd(sample_z: np.ndarray, k: int) -> np.ndarray:
    """Lloyd's k-means on quantized int64 vectors, initialized with the
    first k sample rows (the sample arrives in (md5(vec_id), vec_id)
    order, so init == the seed-quantizer selection shared with
    similarity_ivf / dedup_semantic; training refines it). All ops are
    int64: argmin ties resolve to the smallest cluster_id (numpy takes
    the first minimum — same as the oracle's ORDER BY d2, cluster_id),
    empty clusters keep their previous centroid, updates use floor
    division. Deterministic and exactly SQL-replayable by construction.

    Degenerate contract: a zero-row sample (empty embeddings table) or
    k == 0 returns an empty (0, dim) centroid array — downstream the
    broadcast centroid table is empty and every query degrades to an
    empty result, never an exception (the 1-D empty np.array would
    otherwise IndexError on the [:, None, :] broadcast below).
    """
    if k <= 0 or len(sample_z) == 0:
        dim = sample_z.shape[1] if sample_z.ndim == 2 else 0
        return np.empty((0, dim), dtype=np.int64)
    cent = sample_z[:k].copy()
    for _ in range(_LLOYD_ITERS):
        d2 = ((sample_z[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = sample_z[assign == j]
            if len(members):
                cent[j] = members.sum(axis=0) // len(members)
    return cent


def _quantize_expr(col: str):
    """array<double> -> array<bigint>: floor(x * Q) + OFFSET, Q a power
    of two — the exact-by-construction quantization shared with the
    oracle (OFFSET keeps components non-negative; see above)."""
    return F.transform(
        F.col(col),
        lambda x: F.floor(x * F.lit(float(_Q))) + F.lit(_OFFSET),
    )


def _corpus_and_centroids(spark: SparkSession, sf_dir: str):
    """(quantized corpus df, trained centroid ndarray) — the
    clustering front half: quantize the corpus (see _Q), train
    fixed-point Lloyd's on the driver over the _SAMPLE_CAP rows with
    the smallest md5(vec_id) (bounded TakeOrdered collect, the
    documented IVF exception). Scoring against the k centroids
    happens per row in the caller (centroid_scores_sql — r13; the
    previous shape crossJoined the corpus with a broadcast centroid
    table and reduced n x k rows back down with a groupBy).

    k is sized to the corpus (target ~{cell} members/cell, capped) via
    one exact count — a column-pruned, row-group-metadata-only scan —
    because the oracle must derive the identical k; oversized k on a
    small corpus makes single-digit cells, the recall killer at
    tau=0.4 (66°), and production SemDeDup scales k with n for the
    same per-cell occupancy reason."""
    e = tbl(spark, sf_dir, "embeddings", fanout=True).where(
        # NULL vectors can't quantize or cluster — the corpus is the
        # non-NULL rows, and k derives from THEIR count so the oracle
        # (whose e CTE carries the same filter) sizes identically
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    z = e.select("vec_id", _quantize_expr("v").alias("z"))
    # r13 (guide §2.6): the k-sizing count and the training-sample
    # TakeOrdered are INDEPENDENT actions (the sample cap is fixed at
    # _SAMPLE_CAP; k only enters Lloyd's afterwards), and each is a
    # full corpus pass — overlap them from a 2-thread pool so the
    # second pass back-fills executors instead of waiting for the
    # first's stragglers.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_n = pool.submit(
            lambda: tbl(spark, sf_dir, "embeddings").where(finite_vec()).count()
        )
        f_sample = pool.submit(
            lambda: z.select(
                "z",
                F.md5(F.col("vec_id").cast("string")).alias("hh"),
                "vec_id",
            )
            .orderBy("hh", "vec_id")
            .limit(_SAMPLE_CAP)
            .collect()
        )
        n, sample_rows = f_n.result(), f_sample.result()
    k = min(_K_MAX, max(1, n // _CELL_TARGET))
    sample_z = np.array([r.z for r in sample_rows], dtype=np.int64)
    cent = _fixedpoint_lloyd(sample_z, min(k, len(sample_z)))
    return z, cent


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, cluster_id (nearest centroid), d2 — hard 1-NN
    assignment as a per-row `array_min` over the literal centroid
    scores (r13; see similarity.centroid_scores_sql — the old shape
    shuffled the corpus x k crossJoin through a groupBy(vec_id)
    min_by). Ties on d2 (possible when duplicate sample vectors seed
    twin centroids) break to the smallest cluster_id via the struct
    ordering, exactly as min_by on struct(d2, cluster_id) did. All
    arithmetic stays int64 (exact, engine-order independent)."""
    from log2ck_spark.queries.similarity import centroid_scores_sql

    z, cent = _corpus_and_centroids(spark, sf_dir)
    if len(cent) == 0:
        # empty corpus: schema-preserving empty frame (the literal
        # expression cannot type an empty centroid array)
        return z.select(
            "vec_id",
            F.lit(0).alias("cluster_id"),
            F.lit(0).cast("long").alias("d2"),
        ).filter(F.lit(False))
    best = F.array_min(
        F.expr(
            centroid_scores_sql(
                cent.tolist(), "cluster_id", v_col="z", integer=True
            )
        )
    )
    return z.select(
        "vec_id",
        best["cluster_id"].alias("cluster_id"),
        best["d2"].alias("d2"),
    )


def _lloyd_iteration_sql(i: int) -> str:
    """One unrolled Lloyd step as CTEs: a{i} assigns the sample to
    c{i-1} (argmin integer d2, ties to smallest cluster_id), m{i}
    takes per-dimension floor-division means, c{i} carries forward
    centroids of empty clusters. Mirrors _fixedpoint_lloyd exactly."""
    return f"""
    a{i} AS (
      SELECT rn, z, cluster_id FROM (
        SELECT rn, z, cluster_id,
               ROW_NUMBER() OVER (PARTITION BY rn
                                  ORDER BY d2, cluster_id) AS pr
        FROM (
          SELECT s.rn, s.z, c.cluster_id,
                 list_sum(list_transform(list_zip(s.z, c.c),
                          p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
          FROM samp s CROSS JOIN c{i - 1} c)
      ) WHERE pr = 1
    ),
    m{i} AS (
      SELECT cluster_id, LIST(s ORDER BY dim) AS c FROM (
        SELECT cluster_id, dim, CAST(SUM(zd) // COUNT(*) AS BIGINT) AS s
        FROM (SELECT cluster_id, UNNEST(z) AS zd,
                     generate_subscripts(z, 1) AS dim FROM a{i})
        GROUP BY cluster_id, dim
      ) GROUP BY cluster_id
    ),
    c{i} AS (
      SELECT p.cluster_id, COALESCE(m.c, p.c) AS c
      FROM c{i - 1} p LEFT JOIN m{i} m USING (cluster_id)
    )"""


def _kmeans_oracle() -> str:
    """Full SQL replay of embedding_kmeans INCLUDING the training loop:
    quantization, md5-ordered sample, seed init, and _LLOYD_ITERS
    unrolled fixed-point Lloyd iterations are all integer-exact (see
    _Q), so DuckDB reproduces the trained centroids bit-for-bit and
    the final corpus assignment + inertia value-for-value — upgrading
    the one remaining trained-model query from the driver's rows-only
    check to a full value check."""
    from log2ck_spark.queries.similarity import SEED_ORDER_SQL

    iters = ",".join(_lloyd_iteration_sql(i) for i in range(1, _LLOYD_ITERS + 1))
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(FLOOR(x * {float(_Q)!r}) AS BIGINT)
                                 + {_OFFSET}) AS z
      FROM embeddings WHERE {ORACLE_FINITE_VEC}
    ),
    params AS (
      SELECT LEAST({_K_MAX}, GREATEST(1, COUNT(*) // {_CELL_TARGET})) AS k
      FROM e
    ),
    samp AS (
      SELECT z, rn FROM (
        SELECT z, ROW_NUMBER() OVER (ORDER BY {SEED_ORDER_SQL}) AS rn
        FROM e
      ) WHERE rn <= {_SAMPLE_CAP}
    ),
    c0 AS (
      SELECT CAST(rn - 1 AS INTEGER) AS cluster_id, z AS c
      FROM samp, params WHERE rn <= params.k
    ),
    {iters},
    final AS (
      SELECT vec_id, cluster_id, d2 FROM (
        SELECT vec_id, cluster_id, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster_id) AS pr
        FROM (
          SELECT e.vec_id, c.cluster_id,
                 list_sum(list_transform(list_zip(e.z, c.c),
                          p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
          FROM e CROSS JOIN c{_LLOYD_ITERS} c)
      ) WHERE pr = 1
    )
    SELECT cluster_id, COUNT(*) AS n_members,
           CAST(SUM(d2) AS BIGINT) AS inertia
    FROM final GROUP BY cluster_id
    """


@register("embedding_kmeans", oracle=_kmeans_oracle())
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus k-means as a query: cluster id -> member count + exact
    integer inertia (in quantized units, i.e. ~Q^2 x the float
    inertia; see _Q), the topic/domain bucketing step of mixture
    design and the coarse structure behind IVF and SemDeDup. Training
    cost is O(sample); the corpus pays one broadcast-assignment scan
    and one tiny partial agg — no step scales worse than linearly.

    Training is fixed-point Lloyd's (_fixedpoint_lloyd): quantizing to
    int64 first makes every distance, argmin, and centroid update an
    exact integer op, which (a) removes float-accumulation
    nondeterminism from partial-aggregation order — the result is
    bit-identical on any cluster layout — and (b) lets the DuckDB
    oracle replay the whole training loop (unrolled CTEs, see
    _kmeans_oracle) for a full value check where iterative float
    k-means could only ever be rows-only."""
    return (
        _assigned(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("d2").alias("inertia"),
        )
    )


# Probe cells per vector for candidate generation. Seed-vector cells
# are less balanced than trained centroids, so recall needs wider
# probing: measured drop-set recall at the fixtures is 0.42/0.55
# (nprobe=2), 0.74/0.83 (3), 0.90/0.93 (4) — 4 buys back more recall
# than trained-centroid nprobe=2 had, at 4x its pair flops (still
# cell-bounded: posting n*nprobe rows into k cells keeps occupancy
# ~nprobe*n/k, and k grows with n).
_NPROBE = 4


def _semdedup_oracle() -> str:
    """Full SQL replay of dedup_semantic. The cell structure is a pure
    function of the table — k = min(64, max(1, n // 32)) seed vectors
    chosen by smallest md5(vec_id) — so DuckDB reproduces the identical
    Voronoi cells, multi-probe postings, within-cell cosine verify, and
    min-id survivorship. d2 ordering is float-noise safe (an
    engine-order flip needs two distances within ~1e-12; exact ties
    break on cluster_id in both engines)."""
    from log2ck_spark.queries.similarity import SEED_ORDER_SQL

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE {ORACLE_FINITE_VEC}),
    params AS (
      SELECT LEAST({_K_MAX}, GREATEST(1, COUNT(*) // {_CELL_TARGET})) AS k
      FROM e
    ),
    seeds AS (
      SELECT v AS c, CAST(rn - 1 AS INTEGER) AS cluster_id FROM (
        SELECT v, ROW_NUMBER() OVER (
                 ORDER BY {SEED_ORDER_SQL}) AS rn
        FROM e
      ), params WHERE rn <= params.k
    ),
    scored AS (
      SELECT e.vec_id, e.v, s.cluster_id,
             POWER(list_distance(e.v, s.c), 2) AS d2
      FROM e CROSS JOIN seeds s
    ),
    ranked AS (
      SELECT vec_id, v, cluster_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2, cluster_id) AS pr
      FROM scored
    ),
    probed AS (SELECT * FROM ranked WHERE pr <= {_NPROBE}),
    assigned AS (SELECT vec_id, cluster_id FROM ranked WHERE pr = 1),
    pairs AS (
      -- zero-norm guard mirroring the Spark kernel (norms==0 -> 1.0,
      -- cosine 0, pair suppressed): list_cosine_similarity yields NaN
      -- for a zero vector and DuckDB orders NaN above all values, so
      -- an unguarded NaN >= tau would pass here.
      SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM probed a
      JOIN probed b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE CASE WHEN list_dot_product(a.v, a.v) = 0
                   OR list_dot_product(b.v, b.v) = 0 THEN 0
                 ELSE ROUND(list_cosine_similarity(a.v, b.v), 6)
            END >= {_SEMDEDUP_TAU}
    ),
    drops AS (SELECT doc_b AS vec_id, COUNT(*) AS n_dups FROM pairs GROUP BY 1)
    SELECT a.vec_id, a.cluster_id,
           CAST(d.n_dups IS NULL AS INTEGER) AS is_kept,
           CAST(COALESCE(d.n_dups, 0) AS BIGINT) AS n_dups
    FROM assigned a LEFT JOIN drops d USING (vec_id)
    """


def _seed_corpus_and_rows(spark: SparkSession, sf_dir: str):
    """(corpus df, collected seed rows) — dedup_semantic's cell front
    half. Unlike `_corpus_and_centroids` (Lloyd's k-means on a driver
    sample, used by embedding_kmeans), the centroids here are the k
    corpus vectors with the SMALLEST md5(vec_id): a deterministic,
    layout-independent selection that is a pure function of the table,
    which makes the whole SemDeDup pipeline SQL-replayable (see
    _semdedup_oracle) — upgrading it from a rows-only driver check to
    a full value check. Cell balance is slightly worse than trained
    centroids; multi-probe posting keeps recall (asserted in tests).

    k sizing uses ONE exact count — a column-pruned metadata-cheap
    scan — instead of the KMV estimate, because the oracle must derive
    the identical k; the count rides the same job wave as the seed
    TakeOrdered."""
    from log2ck_spark.queries.similarity import seed_centroid_rows

    e = tbl(spark, sf_dir, "embeddings", fanout=True).where(
        # NULL vectors can't seed or join cells — corpus = non-NULL
        # rows; k derives from their count, mirrored by the oracle
        finite_vec()
    ).select(
        "vec_id", as_double("embedding").alias("v")
    )
    # count the RAW scan (with only the membership filter), not `e`:
    # counting after the cast+fanout would add the cast and the fanout
    # repartition to a job that only needs a row count. Since the r10
    # finite_vec contract the filter must decode each embedding's
    # component values (the exists() scan) — no longer a
    # definition-levels-only read — but it is still one column, one
    # pass, no shuffle.
    # r13 (guide §2.6): the k-sizing count and the seed TakeOrdered
    # are both full corpus passes. Collecting the top _K_MAX rows
    # (instead of top k) breaks the count -> k -> collect dependency —
    # the deterministic (md5, vec_id) total order makes the first k of
    # the top-64 exactly the top-k — so the two jobs run overlapped
    # from a 2-thread pool, back-filling each other's stragglers.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_n = pool.submit(
            lambda: tbl(spark, sf_dir, "embeddings").where(finite_vec()).count()
        )
        f_seeds = pool.submit(lambda: seed_centroid_rows(e, _K_MAX))
        n, seed_rows = f_n.result(), f_seeds.result()
    k = min(_K_MAX, max(1, n // _CELL_TARGET))
    return e, seed_rows[:k]


@register("dedup_semantic", oracle=_semdedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop a vector iff some vector with a smaller id that
    shares one of its {nprobe} nearest Voronoi cells sits within
    cosine >= {tau} — semantic near-dup removal whose pair expansion
    is confined to cells instead of the corpus (the paper's trick for
    making O(n^2) dedup tractable: cluster first, compare within
    cells only).

    Emits (vec_id, cluster_id, is_kept, n_dups) for every vector.
    Multi-probe candidates: wide-angle near-dups (tau=0.4 is a 66°
    cone) frequently straddle a Voronoi boundary, so each vector posts
    into its {nprobe} nearest cells (recall-vs-flops numbers at the
    _NPROBE constant); the reported cluster_id stays the hard 1-NN
    assignment.
    Scale shape: cells hold ~n/k members and k grows with n, so the
    per-cell pair expansion is bounded; the only shuffles are the
    per-vector top-nprobe agg and one groupBy over candidate pairs.
    min-id survivor (not the paper's farthest-from-centroid) keeps
    the output rerun-deterministic. Precision vs the brute-force pair
    set is 1.0 by construction (exact cosine verify); recall is
    cluster-split-dependent and asserted in tests.

    Cells are deterministic seed-vector Voronoi cells (see
    _seed_corpus_and_rows) rather than the paper's trained k-means — the
    partitioner is a free choice in SemDeDup (any cell structure gives
    precision 1.0; only recall varies), and the deterministic one lets
    the DuckDB oracle replay the ENTIRE pipeline value-for-value
    (_semdedup_oracle) instead of the weaker rows-only check.

    Execution: the within-cell comparison runs as ONE vectorized
    cosine matrix per cell (Arrow-batched applyInPandas) — the
    canonical SemDeDup kernel. Only the bounded cells shuffle (each
    vector travels to its nprobe cells once); the alternative
    candidate-pair expansion + payload re-join shuffles every
    candidate with two full vectors attached (measured 2.5x slower at
    sf0.1) and is quadratic in rows, not flops."""
    import pandas as pd

    from log2ck_spark.queries.similarity import centroid_scores_sql

    e, seed_rows = _seed_corpus_and_rows(spark, sf_dir)
    if not seed_rows:
        # empty corpus: schema-preserving empty frame (the literal
        # expression cannot type an empty centroid array)
        return e.select(
            "vec_id",
            F.lit(0).alias("cluster_id"),
            F.lit(1).alias("is_kept"),
            F.lit(0).cast("bigint").alias("n_dups"),
        ).filter(F.lit(False))
    # r13 (guide §2.4): top-nprobe cells per vector as a per-row
    # slice(array_sort(...)) over the literal seed centroids — the old
    # shape crossJoined the corpus with a broadcast k-row seed table
    # and ran a Window-partitionBy(vec_id) row_number over the n x k
    # inflated frame (a full exchange + per-group sort) to pick 4 of
    # 64 scores per vector; see centroid_scores_sql. Same (d2,
    # cluster_id) ordering, same values.
    scores = F.expr(
        centroid_scores_sql([r.v for r in seed_rows], "cluster_id")
    )
    # persist the top-nprobe frame: it feeds BOTH the hard assignment
    # and the per-cell kernel — without the cache the corpus scan and
    # the k-centroid scoring expression run twice.
    ranked = (
        e.select(
            "vec_id",
            "v",
            F.posexplode(
                F.slice(F.array_sort(scores), 1, _NPROBE)
            ).alias("pos", "s"),
        )
        .select(
            "vec_id",
            "v",
            (F.col("pos") + 1).alias("pr"),
            F.col("s.cluster_id").alias("cluster_id"),
        )
        .persist()
    )
    assigned = ranked.filter(F.col("pr") == 1).select(
        "vec_id", "cluster_id", "v"
    )

    def _cell_dup_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one cell: exact pairwise cosine via a single matmul, emit
        # only the (smaller_id, larger_id) pairs at/above tau. Cosine
        # rounds to 6 decimals to match functions.vectors.cosine.
        ids = pdf["vec_id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy())
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = np.round((mat / norms) @ (mat / norms).T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= _SEMDEDUP_TAU
        a, b = ids[iu[hit]], ids[ju[hit]]
        return pd.DataFrame(
            {"doc_a": np.minimum(a, b), "doc_b": np.maximum(a, b)}
        )

    dup_pairs = (
        ranked.select("cluster_id", "vec_id", "v")
        .groupBy("cluster_id")
        .applyInPandas(_cell_dup_pairs, "doc_a bigint, doc_b bigint")
        # a pair whose two vectors share BOTH probe cells is emitted
        # once per shared cell — dedup before counting.
        .distinct()
    )
    # doc_b always > doc_a, so doc_b is the dropped side: count each
    # vector's smaller-id near-dups.
    drops = dup_pairs.groupBy(F.col("doc_b").alias("vec_id")).agg(
        F.count("*").alias("n_dups")
    )
    return (
        assigned.join(drops, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.col("n_dups").isNull().cast("int").alias("is_kept"),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
        )
    )
