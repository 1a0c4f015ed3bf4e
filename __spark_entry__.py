"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the log2ck_spark query registry: every operator from
SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable plus —
where ANSI-SQL-expressible — a DuckDB oracle twin with identical
column aliases.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    star join (customer ⋈ orders ⋈ lineitem) + agg + top-k."""
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["tpch_q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from log2ck_spark.queries import ORACLES, load_all

    load_all()
    return dict(ORACLES)
