"""Embedding-column operators beyond similarity search — the vector
hygiene layer of a training pipeline: L2 normalization, scalar
quantization, per-dimension corpus statistics, and kNN label
prediction.

All pure higher-order column expressions (zip_with / aggregate /
transform) over `array<float>` cast to double — JVM-side, codegen'd,
no UDFs. Float-derived outputs are rounded to 6 decimals before
comparison/ranking so cross-engine ULP differences can't surface
(same policy as similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2ck_spark.functions.vectors import (
    ORACLE_FINITE_VEC,
    as_double,
    cosine,
    finite_vec,
    norm,
)
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

# --------------------------------------------------------------------------
# L2 normalization
# --------------------------------------------------------------------------


@register(
    "embedding_normalize",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE {ORACLE_FINITE_VEC}
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e
    )
    SELECT vec_id,
           ROUND(nrm, 6) AS norm,
           md5(array_to_string(
             list_transform(v, x ->
               CAST(CAST(ROUND(x / nrm, 6) AS DECIMAL(12,6)) AS VARCHAR)),
             ',')) AS unit_digest,
           ROUND(v[1] / nrm, 6) AS unit_head,
           ROUND(v[len(v)] / nrm, 6) AS unit_tail
    FROM n
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize every embedding (the precondition for treating
    dot product as cosine — do it once at ingest, not per query).
    Norm and division run as one codegen'd expression per row; zero
    shuffles, embarrassingly parallel at any corpus size. The norm is
    bound as a real column before the transform so it isn't
    re-evaluated per element.

    The unit vector is emitted as an md5 digest of its fixed-point
    (DECIMAL(12,6)) rendering plus head/tail spot values — not a raw
    array column — because raw arrays are unhashable in the external
    harness's canonicalizer (same policy as text_winnow_fingerprint).

    Corpus membership is finite_vec (non-NULL, all components finite,
    --nonfinite contract): a NaN/Inf component would make norm and
    every unit component NaN — an ingest normalizer drops the vector,
    it doesn't emit a poisoned one."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(finite_vec())
        .select("vec_id", as_double("embedding").alias("v"))
    )
    bound = e.withColumn("nrm", norm(F.col("v")))
    unit_str = F.transform(
        "v",
        lambda x: F.round(x / F.col("nrm"), 6).cast("decimal(12,6)").cast("string"),
    )
    last = F.element_at("v", F.size("v"))
    return bound.select(
        "vec_id",
        F.round("nrm", 6).alias("norm"),
        F.md5(F.array_join(unit_str, ",")).alias("unit_digest"),
        F.round(F.element_at("v", 1) / F.col("nrm"), 6).alias("unit_head"),
        F.round(last / F.col("nrm"), 6).alias("unit_tail"),
    )


# --------------------------------------------------------------------------
# Min-max scalar quantization (8-bit)
# --------------------------------------------------------------------------


@register(
    "embedding_quantize",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE {ORACLE_FINITE_VEC}
    ), b AS (
      SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e
    ), q AS (
      SELECT vec_id, lo, hi,
             list_transform(v, x ->
               CASE WHEN hi = lo THEN 0
                    ELSE CAST(ROUND(255.0 * (x - lo) / (hi - lo), 0) AS INTEGER)
               END) AS q8
      FROM b
    )
    SELECT vec_id,
           ROUND(lo, 6) AS lo, ROUND(hi, 6) AS hi,
           md5(array_to_string(
             list_transform(q8, c -> CAST(c AS VARCHAR)), ',')) AS q8_digest,
           CAST(list_sum(q8) AS BIGINT) AS q8_sum
    FROM q
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max quantization to 8-bit codes plus the
    (lo, hi) dequantization range — 4x storage reduction for ANN
    shortlists. Integer outputs sidestep float-hash fragility; the
    scale params are bound as columns before the transform. Pure
    map-side expression, no shuffle.

    Codes are emitted as an md5 digest of the comma-joined integer
    sequence plus an integer checksum — not a raw array column — so
    the external harness's canonicalizer can hash every output column
    (same policy as embedding_normalize).

    Corpus membership is finite_vec (--nonfinite contract, same as
    embedding_normalize): min-max scaling over a NaN/Inf component
    poisons lo/hi and every code."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(finite_vec())
        .select("vec_id", as_double("embedding").alias("v"))
    )
    b = e.withColumn("lo_r", F.array_min("v")).withColumn("hi_r", F.array_max("v"))
    # Constant vectors have hi == lo: the scale divides by zero and
    # every code would come out NaN->null. Emit code 0 (lo==hi carries
    # the exact value for dequantization) — mirrored in the oracle.
    code = F.transform(
        "v",
        lambda x: F.when(
            F.col("hi_r") == F.col("lo_r"), F.lit(0)
        ).otherwise(
            F.round(
                F.lit(255.0)
                * (x - F.col("lo_r"))
                / (F.col("hi_r") - F.col("lo_r")),
                0,
            ).cast("int")
        ),
    )
    q = b.withColumn("q8", code)
    return q.select(
        "vec_id",
        F.round("lo_r", 6).alias("lo"),
        F.round("hi_r", 6).alias("hi"),
        F.md5(
            F.array_join(F.transform("q8", lambda c: c.cast("string")), ",")
        ).alias("q8_digest"),
        F.aggregate(
            "q8", F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("q8_sum"),
    )


# --------------------------------------------------------------------------
# Per-dimension corpus statistics
# --------------------------------------------------------------------------


@register(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (
      SELECT g.pos AS pos, CAST(embedding[g.pos] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) g
    )
    SELECT CAST(pos AS INTEGER) AS pos,
           ROUND(CAST(CAST(SUM(TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / COUNT(x), 6)
             AS mean,
           ROUND(sqrt(greatest(
             CAST(CAST(SUM(TRY_CAST(CAST(x * x AS VARCHAR) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / COUNT(x)
             - pow(CAST(CAST(SUM(TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / COUNT(x), 2),
             0.0)), 6) AS std
    FROM ex GROUP BY pos
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and standard deviation across the corpus —
    the whitening / feature-scaling statistics, and the drift check
    between embedding batches. posexplode + ONE two-phase aggregation
    computing Σx and Σx² together (E[x²]−E[x]² identity): the shuffle
    carries dims × partitions partial rows. Both sums decimal-exact so
    the stats are partitioning-independent."""
    ex = tbl(spark, sf_dir, "embeddings").select(
        F.posexplode(as_double("embedding")).alias("pos0", "x")
    )
    s = F.sum(F.col("x").try_cast("decimal(18,9)")).cast("double")
    s2 = F.sum((F.col("x") * F.col("x")).try_cast("decimal(18,9)")).cast("double")
    n = F.count("x")
    mean = s / n
    return ex.groupBy((F.col("pos0") + 1).cast("int").alias("pos")).agg(
        F.round(mean, 6).alias("mean"),
        F.round(
            F.sqrt(F.greatest(s2 / n - F.pow(mean, 2), F.lit(0.0))), 6
        ).alias("std"),
    )


# --------------------------------------------------------------------------
# kNN label prediction (majority vote over exact top-k)
# --------------------------------------------------------------------------

_KNN_QUERIES = 10
_KNN_K = 5


@register(
    "knn_classify",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE {ORACLE_FINITE_VEC}
    ), scored AS (
      SELECT q.vec_id AS query_id, c.label,
             ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos,
             c.vec_id AS neighbor_id
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_KNN_QUERIES} AND c.label IS NOT NULL
    ), topk AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= {_KNN_K}
    ), votes AS (
      SELECT query_id, label, COUNT(*) AS n_votes FROM topk GROUP BY 1, 2
    )
    SELECT query_id, label AS pred_label, CAST(n_votes AS INTEGER) AS n_votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote kNN classification over the exact top-5 cosine
    neighbors — the label-propagation / weak-annotation primitive.
    Query batch broadcasts against one corpus scan (same skeleton as
    similarity_topk, so the ANN variants drop in unchanged at scale);
    ranking and voting use rounded cosines + deterministic tie-breaks
    (neighbor_id, then smallest label) so the prediction set is
    engine-stable. Only LABELED neighbors vote (standard kNN — the
    training set is the labeled subset; an unlabeled row can still be
    a query). Without that filter a NULL-label group can win the vote,
    and the tie-break then diverges cross-engine: Spark's ascending
    sort puts NULL first, DuckDB's puts it last."""
    e = tbl(spark, sf_dir, "embeddings").where(
        # NULL vectors (failed embedding jobs) can neither query nor
        # vote — the corpus is the non-NULL rows (--sparse gate)
        finite_vec()
    ).select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    labeled = e.filter(F.col("label").isNotNull())
    scored = labeled.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        cosine(F.col("qv"), F.col("v")).alias("cos"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    topk = scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= _KNN_K
    )
    votes = topk.groupBy("query_id", "label").agg(
        F.count("*").cast("int").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )
