"""Custom PySpark data sources (the reference's file-tailing input
re-expressed with Spark's Python Data Source API)."""

from log2ck_spark.sources.tailsource import (
    TailFileDataSource,
    register_tail_source,
)

__all__ = ["TailFileDataSource", "register_tail_source"]
