"""SparkSession construction tuned for this engine.

Local-mode defaults mirror what we would set per-cluster at scale:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
shuffle partitions sized to cores (would be ~2-3x total cores on a real
cluster), Arrow for any pandas exchange, UTC session time so timestamp
semantics match the (naive-UTC) parquet test data and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".scratch")

# InferFiltersFromGenerate synthesizes `size(e) > 0 AND isnotnull(e)`
# below every explode(e) and pushdown then re-inlines e's FULL defining
# expression into that filter — for the expensive generator expressions
# this engine explodes (5-gram shingle pipelines, winnowing
# fingerprints, zip_with bigrams) the whole per-row pipeline runs 3x,
# and below a fanout repartition it runs single-task (r13; measured
# 1.41 -> 0.47 s on the winnow posting stage alone, values identical).
# The filter is semantically redundant — Generate itself emits nothing
# for NULL/empty arrays — so excluding the rule never changes results.
EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def exclude_generate_filter_rule(spark: SparkSession) -> None:
    """Append our exclusion to the session's optimizer rule blocklist
    without clobbering exclusions the host session already carries
    (the driver's session is not ours to overwrite)."""
    try:
        current = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        current = None
    if not current:
        spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_RULES)
    elif EXCLUDED_RULES not in current:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", current + "," + EXCLUDED_RULES
        )


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (e.g. the
    driver's). Only touches conf that is safe to set post-start."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    exclude_generate_filter_rule(spark)
    return spark


def get_spark(app_name: str = "log2ck_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.excludedRules", EXCLUDED_RULES)
        .config("spark.driver.memory", os.environ.get("LOG2CK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(SCRATCH, "warehouse"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
