"""Sink schema evolution — the reference lets a callback emit new
keys and tells the user to evolve the ClickHouse table to match
(`/root/reference/readme.md:82-85,107`). Our parquet sink must keep
old data readable when new columns appear: Spark's mergeSchema union
is the mechanism, with absent columns null-filled."""

from __future__ import annotations


def test_merge_schema_unions_old_and_new_columns(spark, tmp_path):
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [("app", "2024-01-01 00:00:00", "boot ok")],
        "name string, created_at string, message string",
    )
    v1.write.mode("append").parquet(path)
    # a later deploy's callback starts emitting a context column
    v2 = spark.createDataFrame(
        [("app", "2024-01-02 00:00:00", "req done", '{"ms": 12}')],
        "name string, created_at string, message string, context string",
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"name", "created_at", "message", "context"}
    rows = {r["created_at"]: r["context"] for r in merged.collect()}
    assert rows["2024-01-01 00:00:00"] is None  # old rows null-extended
    assert rows["2024-01-02 00:00:00"] == '{"ms": 12}'


def test_default_read_uses_latest_schema_superset(spark, tmp_path):
    """Without mergeSchema Spark picks one footer's schema — document
    the operational rule: evolving sinks must read with mergeSchema
    (or a declared schema) or new columns can silently vanish."""
    path = str(tmp_path / "evolving2")
    spark.createDataFrame([(1,)], "a int").write.mode("append").parquet(path)
    spark.createDataFrame([(2, "x")], "a int, b string").write.mode(
        "append"
    ).parquet(path)
    declared = spark.read.schema("a int, b string").parquet(path)
    got = sorted((r["a"], r["b"]) for r in declared.collect())
    assert got == [(1, None), (2, "x")]
