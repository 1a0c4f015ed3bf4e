"""Scale-technique showcases: salted skew aggregation and bucketed
co-located joins.

These two operators exist to demonstrate, with oracle-checked results
and plan-shape tests, the two classic shuffle disciplines a 100 TB
deployment leans on:

* **Salting** — when a group-by key is pathologically skewed (a log
  table's `level` column is the canonical case: 99% `info`), a single
  reducer owns the hot key. Salting splits each key into S sub-keys for
  the partial phase and re-combines, bounding any one task at 1/S of
  the hot key. (AQE's skew-join splitting handles JOIN skew; agg-side
  salting is still the portable fix for reducer-side agg skew.)
* **Bucketing** — pre-shuffling both sides of a recurring join into the
  same bucket layout (`bucketBy` + `sortBy` metastore tables) makes
  every later join on that key exchange-free: each task zips bucket i
  of both sides. At 100 TB this converts the nightly fact⋈fact join
  from a full network shuffle into a local merge.

The reference (hisune/log2ck) has no aggregation engine at all — it
delegates to ClickHouse (`readme.md:106-125`); these are the Spark-side
physical disciplines that replace MergeTree's sorted/merged parts.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import dsum, oracle_davg, oracle_dsum
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

_SALT = 16


@register(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sum_qty},
           {avg_price}
    FROM lineitem GROUP BY l_returnflag
    """.format(
        sum_qty=oracle_dsum("l_quantity", "sum_qty"),
        avg_price=oracle_davg("l_extendedprice", "avg_price"),
    ),
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value key (l_returnflag —
    the shape of a log table's `level` column at 10^12 rows).

    Phase 1 groups by (key, salt) where salt = xxhash64(row-unique) %
    16: the hot key's rows spread over 16 reducers, each emitting one
    partial row. Phase 2 re-aggregates the ≤ keys×16 partials by key —
    trivially small. Result is identical to the direct groupBy (sums
    are decimal-exact ⇒ associative), which is exactly what the oracle
    checks. COUNT re-sums phase-1 counts; AVG carries (sum, count)
    through the salt phase — the standard algebraic-aggregate
    decomposition."""
    li = tbl(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_partkey"), F.lit(_SALT))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_quantity").try_cast("decimal(18,6)")).alias("pqty"),
        F.sum(F.col("l_extendedprice").try_cast("decimal(18,6)")).alias("pprice"),
        # AVG's denominator must be the count of values INCLUDED in the
        # sum — i.e. the non-NULL try_cast count, matching the oracle's
        # COUNT(TRY_CAST(expr)). Dividing by the row count pn would
        # silently drift on nullable columns or excluded magnitudes.
        F.count(F.col("l_extendedprice").try_cast("decimal(18,6)")).alias("pc"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("pqty").cast("double").alias("sum_qty"),
        (F.sum("pprice").cast("double") / F.sum("pc")).alias("avg_price"),
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {avg_disc}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """.format(avg_disc=oracle_davg("l.l_discount", "avg_discount")),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicate join — the manual fix for a hot join key when the
    small side is still too big to broadcast (or the engine predates
    AQE skew splitting; Spark's AQE handles sort-merge skew, but a
    replicated salt is the portable technique streaming joins and
    older stacks still need).

    Probe side (lineitem) tags each row with salt =
    xxhash64(row-unique) % S; build side (orders) replicates every row
    S times via posexplode. The join key becomes (orderkey, salt): a
    key owning 30% of the probe rows now spreads over S reducers, at
    the cost of an S× build-side blowup — which is why S stays small
    and why this pairs with an aggregation that collapses the result
    immediately. Result is EXACTLY the plain join (oracle-checked)."""
    S = 8
    li = tbl(spark, sf_dir, "lineitem").withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_partkey", "l_suppkey"), F.lit(S)),
    )
    od = (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("_salt"))
    )
    joined = li.hint("shuffle_hash").join(
        od,
        (li.l_orderkey == od.o_orderkey) & (li._salt == od._salt),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("l_discount").try_cast("decimal(18,6)")).cast("double")
            / F.count(F.col("l_discount").try_cast("decimal(18,6)"))
        ).alias("avg_discount"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {revenue}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """.format(
        revenue=oracle_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join on pre-bucketed tables: both sides written once
    with `bucketBy(8, orderkey) + sortBy(orderkey)` into the session
    warehouse; the join then reads bucket i of each side into the same
    task — NO Exchange in the join stage (asserted in
    tests/test_plans.py). The one-time bucketed write is the amortized
    cost; every subsequent join/agg on the bucket key is shuffle-free.
    This is Spark's answer to the reference DDL's `ORDER BY
    (created_at, repo, host)` MergeTree layout (`readme.md:122`): both
    pre-pay an organized layout to make recurring reads cheap.

    Bucket pruning also applies: a point lookup on the bucket key scans
    1/8 of the files. Spark still inserts a defensive per-bucket Sort
    before the merge (it does not trust sortBy metadata across files) —
    that sort is task-local over one bucket, not a shuffle; the
    Exchange elimination is the part that matters at 100 TB."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ot, lt = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"
    catalog = spark.catalog

    def _clear_stale(table: str) -> None:
        # the metastore is session-scoped but the warehouse dir is not:
        # a fresh session must clear a previous session's managed-table
        # location before saveAsTable may reuse the name
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        if loc and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    # repartition(8, key) before the bucketed write → exactly one file
    # per bucket; Spark then trusts the sortBy metadata and elides the
    # pre-join Sort too (multi-file buckets force a defensive re-sort).
    if not catalog.tableExists(ot):
        _clear_stale(ot)
        tbl(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).repartition(8, F.col("o_orderkey")).write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable(ot)
    if not catalog.tableExists(lt):
        _clear_stale(lt)
        tbl(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ).repartition(8, F.col("l_orderkey")).write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable(lt)
    o = spark.table(ot)
    li = spark.table(lt)
    # hint('merge'): at test SFs AQE would broadcast the small side,
    # hiding the exchange-free bucketed merge this operator showcases;
    # at production fact sizes SMJ is what the planner picks anyway.
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"
        ),
    )
