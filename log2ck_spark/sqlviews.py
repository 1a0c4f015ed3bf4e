"""SQL access surface: register the test tables plus derived views so
users can query with `spark.sql(...)` exactly like they queried the
reference's ClickHouse tables (readme.md:106-125 shows raw-SQL usage;
here Catalyst gets the same declarative plans as the DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from log2ck_spark.io import TABLES, tbl


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create one temp view per fixture table (normalized schemas —
    events.ts is a proper TIMESTAMP regardless of the file's physical
    type) plus a `logs`-style view mirroring the reference DDL's
    column names. Returns the registered view names."""
    names = []
    for name in TABLES:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    # the reference's `logs` table shape (readme.md:109-123): map the
    # events fixture onto (created_at, level-ish event_type, value…)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW logs AS
        SELECT event_id,
               ts AS created_at,
               to_date(ts) AS log_date,
               user_id,
               event_type AS level,
               value,
               props AS context
        FROM events
        """
    )
    names.append("logs")
    return names
