"""spark.sql over registered views — the reference user's SQL habit."""

from __future__ import annotations

from log2ck_spark.sqlviews import register_views


def test_register_views_and_query(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "events" in names and "logs" in names and "lineitem" in names

    # reference-style log query (readme.md's SELECT ... WHERE level)
    rows = spark.sql(
        """
        SELECT level, COUNT(*) AS n, date_trunc('DAY', created_at) AS day
        FROM logs
        WHERE created_at >= TIMESTAMP '2024-01-01 00:00:00'
        GROUP BY level, day ORDER BY n DESC LIMIT 5
        """
    ).collect()
    assert rows and all(r.n > 0 for r in rows)

    # ts is a real TIMESTAMP in SQL-land (the NTZ normalization held)
    (dt,) = spark.sql("SELECT typeof(ts) AS t FROM events LIMIT 1").collect()
    assert dt.t == "timestamp"

    # a TPC-H-ish ad-hoc join straight from SQL
    (row,) = spark.sql(
        """
        SELECT COUNT(*) AS n FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        """
    ).collect()
    assert row.n > 0
