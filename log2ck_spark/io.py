"""Table loading + scratch-dir helpers shared by the query library."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH_ROOT = os.path.join(_REPO_ROOT, ".scratch")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def tbl(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool = False
) -> DataFrame:
    """Load one test table. Forces UTC session time so timestamps read
    from (naive) parquet agree with the DuckDB oracle regardless of the
    caller's session defaults.

    events.ts has shipped under two physical types across fixture
    generations, and we normalize both to a plain (UTC) TIMESTAMP so
    every downstream query sees one logical type:

    * parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it,
      so we read raw nanos (`nanosAsLong`) and convert with exact
      integer division (`DIV` — a double division would lose precision
      above 2^53), matching DuckDB's nanos→micros truncation.
    * parquet timestamp[us] without a timezone (isAdjustedToUTC=false):
      Spark reads TIMESTAMP_NTZ, which `unix_micros`/`window` & friends
      reject. Under the forced-UTC session zone an NTZ→TIMESTAMP cast
      is a pure re-tag (identical micros value), and it matches DuckDB,
      whose TIMESTAMP is also naive.

    ``fanout=True`` round-robin-repartitions to the session's default
    parallelism right after the scan. The fixture files are single-
    row-group parquet, so the file source cannot split them — without
    this, a compute-heavy pipeline (regex parse, shingling, signature
    hashing) runs its whole scan stage on ONE core. This is purely a
    local-fixture compensation: a production table has many row
    groups/files and parallelizes natively, so callers only set it
    where per-row compute dominates the added narrow shuffle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Read naive parquet timestamps as TIMESTAMP (not TIMESTAMP_NTZ) at
    # the scan itself: predicates on ts then push down to parquet
    # natively instead of hiding behind a post-scan NTZ->LTZ cast.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if fanout:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def scratch_dir(*keys: str) -> str:
    """A writable scratch path inside the repo (we must not write
    outside /root/repo). Keyed so different sf_dirs don't collide."""
    digest = hashlib.md5("|".join(keys).encode()).hexdigest()[:12]
    path = os.path.join(SCRATCH_ROOT, f"{os.path.basename(keys[0].rstrip('/'))}-{digest}")
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return path


def ensure_staged(path: str, write) -> str:
    """Idempotent fixture staging: run ``write(path)`` only when `path`
    lacks a ``_SUCCESS`` marker (Spark's file writers commit one; a
    custom writer must create it LAST). Staged corpora are pure
    functions of their scratch key — the testdata under an sf_dir is
    immutable — so a committed write never needs repeating; re-staging
    identical bytes on every invocation just buries the measured read
    path under fixture overhead. Crash-safe: ``mode("overwrite")``
    deletes the directory (marker included) before rewriting, so a
    half-finished restage can never present a stale marker. Remove
    ``.scratch/`` to force a rebuild (keys embed a content version —
    bump the key when the generator changes)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write(path)
    return path
