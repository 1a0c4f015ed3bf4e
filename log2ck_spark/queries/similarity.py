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

from log2ck_spark.functions.vectors import as_double, cosine, dot
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

N_QUERIES = 5
TOP_K = 5


@register(
    "similarity_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
    e = tbl(spark, sf_dir, "embeddings").select(
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


@register("similarity_lsh")
def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 4 tables x 8-bit signatures.

    sig_t(v) = bits of sign(v·h_i); same (table, sig) ⇒ candidate.
    Exact cosine re-scored within buckets, top-k per query. Planes are
    literal arrays (seeded numpy) folded into the plan — broadcast to
    every task, no shuffle to build the index."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    dim = len(e.select("v").first()[0])
    n_tables, bits = 4, 8
    planes = _hyperplanes(dim, n_tables * bits)

    def signature(v, table: int):
        sig = F.lit(0)
        for b in range(bits):
            h = F.array(*[F.lit(x) for x in planes[table * bits + b]])
            sig = sig + F.when(dot(v, h) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        return sig

    buckets = e.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        signature(F.col("v"), t).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "tb.table", "tb.sig")

    q = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "table",
        "sig",
    )
    cand = (
        buckets.join(q, ["table", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
        .distinct()
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
