"""TTL retention (B3) + approx-distinct error bound + multimodal stub."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from log2ck_spark.maintenance import expired_partitions, ttl_expire_partitions


def test_ttl_drops_only_expired_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-05", 2), ("2024-01-20", 3)],
        "log_date string, v int",
    )
    path = str(tmp_path / "table")
    df.write.partitionBy("log_date").parquet(path)

    today = date(2024, 1, 21)
    assert len(expired_partitions(path, ttl_days=10, today=today)) == 2
    dropped = ttl_expire_partitions(path, ttl_days=10, today=today)
    assert len(dropped) == 2
    left = spark.read.parquet(path)
    assert [str(r["log_date"]) for r in left.select("log_date").collect()] == [
        "2024-01-20"
    ]
    # idempotent
    assert ttl_expire_partitions(path, ttl_days=10, today=today) == []


def test_ttl_missing_table_is_noop(tmp_path):
    assert ttl_expire_partitions(str(tmp_path / "nope"), 10) == []


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The portable m=512 HLL's standard error is 1.04/sqrt(512) =
    4.6% (vs the old Spark-native rsd=0.02 config — portability costs
    register count); assert within 3 sigma, with an absolute floor of
    2 for tiny groups where one bucket collision is a whole unit of
    relative error (observed: 15 distinct -> estimate 14)."""
    from log2ck_spark.queries import QUERIES, load_all
    from log2ck_spark.io import tbl

    load_all()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2.0, 3 * 0.046 * n), (
            et,
            approx[et],
            n,
        )


def test_multimodal_decode_stub_raises(spark, sf_dir):
    """The real-codec path must fail loudly, not fake silently."""
    from log2ck_spark.queries.multimodal import binary_docs, decode_image

    df = binary_docs(spark, sf_dir).limit(1)
    pdf_iter = iter([df.toPandas()])
    with pytest.raises(NotImplementedError):
        list(decode_image(pdf_iter, fake=False))


def test_similarity_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=4/16 lists must recover a solid fraction of the
    true top-5 (random near-orthogonal vectors make ANN hard; we bound
    recall loosely but non-trivially) and respect the k cap."""
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["similarity_topk"](spark, sf_dir).collect()
    approx = QUERIES["similarity_ivf"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(
        1 for r in approx if r["neighbor_id"] in exact_sets.get(r["query_id"], set())
    )
    assert len(approx) <= 5 * len(exact_sets)
    assert hit >= 3, f"IVF recall too low: {hit}"


def test_similarity_lsh_recall_vs_exact(spark, sf_dir):
    """LSH ANN recall@5 vs brute force — sanity bound, seed-stable."""
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["similarity_topk"](spark, sf_dir).collect()
    approx = QUERIES["similarity_lsh"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for r in approx:
        tot += 1
        if r["neighbor_id"] in exact_sets.get(r["query_id"], set()):
            hit += 1
    # random-hyperplane LSH on near-orthogonal random vectors is a weak
    # filter; just require it returns non-trivial overlap and capped k
    assert tot <= 5 * len(exact_sets)
    assert hit >= 1


def test_dedup_embedding_lsh_recall_and_precision(spark, sf_dir):
    """Full-corpus LSH near-dup vs brute-force ground truth: precision
    must be 1.0 (exact verify step), recall high (16x4 banding)."""
    from pyspark.sql import functions as F

    from log2ck_spark.functions.vectors import as_double, cosine
    from log2ck_spark.io import tbl
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    truth = {
        (r.x, r.y)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("x"),
            F.col("b.vec_id").alias("y"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.4)
        .collect()
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_lsh"](spark, sf_dir).collect()
    }
    assert got <= truth, got - truth  # precision 1.0 by construction
    assert truth, "fixture should contain near-dup pairs"
    assert len(got & truth) / len(truth) >= 0.8, (len(got), len(truth))


def test_compaction_crash_recovery_and_hidden_state(spark, tmp_path):
    """Simulate every crash window of the compaction swap: the table
    must read back complete at each point, in-flight state must be
    invisible to Spark's partition discovery, and recover_compaction
    must restore a clean layout."""
    import os

    from log2ck_spark.maintenance import (
        _hidden_sibling,
        compact_partitions,
        recover_compaction,
    )

    path = str(tmp_path / "ctable")
    frag = spark.createDataFrame(
        [("2024-01-01", i, f"2024-01-01 00:00:{i:02d}") for i in range(24)],
        "log_date string, v int, created_at string",
    ).repartition(12)
    frag.write.partitionBy("log_date").parquet(path)
    part = os.path.join(path, "log_date=2024-01-01")
    expected = sorted(r["v"] for r in spark.read.parquet(path).collect())

    # crash window 1: tmp fully written, swap not started
    tmp = _hidden_sibling(part, ".compact_tmp")
    spark.read.parquet(part).coalesce(1).write.parquet(tmp)
    # hidden dir is invisible: read sees only the live partition
    assert sorted(r["v"] for r in spark.read.parquet(path).collect()) == expected
    restored = recover_compaction(path)
    assert restored == [] and not os.path.exists(tmp)

    # crash window 2: live renamed away, new dir not yet published
    spark.read.parquet(part).coalesce(1).write.parquet(tmp)
    old = _hidden_sibling(part, ".compact_old")
    os.rename(part, old)
    assert recover_compaction(path) == [part]  # old restored to live
    assert os.path.isdir(part) and not os.path.exists(old)
    assert not os.path.exists(tmp)
    assert sorted(r["v"] for r in spark.read.parquet(path).collect()) == expected

    # full run from the recovered state still compacts to one file
    assert compact_partitions(spark, path, max_files=8, target_files=1) == [part]
    n_files = sum(1 for f in os.listdir(part) if f.endswith(".parquet"))
    assert n_files == 1
    assert sorted(r["v"] for r in spark.read.parquet(path).collect()) == expected
    # no hidden compaction state left behind
    assert [
        e for e in os.listdir(path) if e.endswith((".compact_tmp", ".compact_old"))
    ] == []


def test_compaction_rewrites_only_oversized_partitions(spark, tmp_path):
    from log2ck_spark.maintenance import compact_partitions, small_file_partitions

    path = str(tmp_path / "ctable")
    # fragmented date: 12 files; healthy date: 1 file
    frag = spark.createDataFrame(
        [("2024-01-01", i, f"2024-01-01 00:00:{i:02d}") for i in range(24)],
        "log_date string, v int, created_at string",
    ).repartition(12)
    frag.write.partitionBy("log_date").parquet(path)
    ok = spark.createDataFrame(
        [("2024-01-02", 99, "2024-01-02 00:00:00")],
        "log_date string, v int, created_at string",
    ).coalesce(1)
    ok.write.mode("append").partitionBy("log_date").parquet(path)

    before = spark.read.parquet(path)
    before_rows = sorted((str(r["log_date"]), r["v"]) for r in before.collect())

    todo = small_file_partitions(path, max_files=8)
    assert [p.split("log_date=")[-1] for p in todo] == ["2024-01-01"]

    import os

    healthy_mtime = os.path.getmtime(os.path.join(path, "log_date=2024-01-02"))
    compacted = compact_partitions(spark, path, max_files=8, target_files=1)
    assert len(compacted) == 1

    part = os.path.join(path, "log_date=2024-01-01")
    n_files = sum(1 for f in os.listdir(part) if f.endswith(".parquet"))
    assert n_files == 1
    # healthy partition untouched, data identical after the rewrite
    assert os.path.getmtime(os.path.join(path, "log_date=2024-01-02")) == healthy_mtime
    after = spark.read.parquet(path)
    after_rows = sorted((str(r["log_date"]), r["v"]) for r in after.collect())
    assert after_rows == before_rows
    # idempotent: nothing left oversized
    assert compact_partitions(spark, path, max_files=8) == []


def _erasure_table(spark, path):
    rows = [
        (d, u, float(u) * 1.5)
        for d in ("2024-01-01", "2024-01-02", "2024-01-03")
        for u in range(10)
    ]
    (
        spark.createDataFrame(rows, "log_date string, user string, v double")
        .withColumn("user", F.concat(F.lit("u"), "user"))
        .write.partitionBy("log_date")
        .parquet(path)
    )


def test_delete_rows_rewrites_only_affected_partitions(spark, tmp_path):
    """GDPR-style erasure: matching rows vanish, non-matching rows
    survive byte-for-byte, and partitions without matches keep their
    EXACT files (no rewrite amplification)."""
    import os

    from log2ck_spark.maintenance import delete_rows

    path = str(tmp_path / "t")
    _erasure_table(spark, path)
    # make one partition match-free by pre-deleting u3 rows from it
    # predicate targets u3 only on two dates via a data-col predicate
    untouched = os.path.join(path, "log_date=2024-01-03")
    # capture exact file listing of a partition that WILL and WON'T match
    res = delete_rows(
        spark, path, "user = 'u3' AND v < 100", partition_col="log_date"
    )
    # u3 exists on all three dates -> all rewritten; redo with a
    # narrower predicate on a fresh table for the untouched assertion
    assert res["rows_deleted"] == 3
    left = spark.read.parquet(path)
    assert left.filter("user = 'u3'").count() == 0
    assert left.count() == 27

    path2 = str(tmp_path / "t2")
    _erasure_table(spark, path2)
    untouched2 = os.path.join(path2, "log_date=2024-01-02")
    files_before = sorted(os.listdir(untouched2))
    res2 = delete_rows(
        spark,
        path2,
        "user = 'u5' AND log_date = '2024-01-01'",
        partition_col="log_date",
    )
    assert res2["rows_deleted"] == 1
    assert sorted(os.listdir(untouched2)) == files_before  # no rewrite
    left2 = spark.read.parquet(path2)
    assert left2.count() == 29
    assert left2.filter("user='u5' AND log_date='2024-01-01'").count() == 0
    assert left2.filter("user='u5'").count() == 2  # other dates intact


def test_delete_rows_retains_null_predicate_rows(spark, tmp_path):
    """SQL DELETE WHERE semantics: rows where the predicate evaluates
    to NULL are retained AND not counted — `NOT (v < 100)` three-valued
    logic would otherwise silently drop a NULL-v row without counting
    it (ClickHouse ALTER DELETE keeps it)."""
    from log2ck_spark.maintenance import delete_rows

    path = str(tmp_path / "tnull")
    (
        spark.createDataFrame(
            [("a", 50), ("b", None), ("c", 500)], "user string, v int"
        )
        .withColumn("log_date", F.lit("2024-01-01"))
        .write.partitionBy("log_date")
        .parquet(path)
    )
    res = delete_rows(spark, path, "v < 100", partition_col="log_date")
    assert res["rows_deleted"] == 1  # only the TRUE row
    left = spark.read.parquet(path)
    assert left.count() == 2
    users = {r.user for r in left.collect()}
    assert users == {"b", "c"}  # NULL-predicate row 'b' survives


def test_delete_rows_crash_recovery_inherits_swap_invariant(spark, tmp_path):
    """A crash between the two renames leaves the hidden .old dir;
    delete_rows (like compaction) must recover it before operating."""
    import os

    from log2ck_spark.maintenance import delete_rows, recover_compaction

    path = str(tmp_path / "t")
    _erasure_table(spark, path)
    part = os.path.join(path, "log_date=2024-01-01")
    # simulate the worst crash point: live dir renamed away, tmp not
    # yet promoted (mid-swap) — data only in the hidden .old sibling
    hidden = os.path.join(path, ".log_date=2024-01-01.compact_old")
    os.rename(part, hidden)
    res = delete_rows(spark, path, "user = 'u0'", partition_col="log_date")
    # recovery restored the partition first, then erasure applied
    left = spark.read.parquet(path)
    assert left.count() == 27 and left.filter("user='u0'").count() == 0


def test_materialize_shards_one_sorted_file_per_shard(spark, tmp_path):
    """The training-order materialization contract: every shard dir
    holds exactly ONE parquet file, rows inside follow the md5 order,
    and the (shard, order) assignment equals the shuffle_shards
    query's layout for the same seed."""
    import os

    from log2ck_spark.io import tbl
    from log2ck_spark.maintenance import materialize_shards
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    sf_dir = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    n = materialize_shards(spark, docs, out, n_shards=8, seed=42)
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) <= n and shard_dirs
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)

    # cross-check the layout against the shuffle_shards query (same
    # md5(id:seed) contract, n_shards=32 there — here just verify the
    # per-shard ORDER matches the hash order for our n_shards=8)
    import hashlib

    for d in sorted(shard_dirs)[:3]:
        got = [
            r.doc_id
            for r in spark.read.parquet(os.path.join(out, d)).collect()
        ]
        expect = sorted(
            got,
            key=lambda i: (hashlib.md5(f"{i}:42".encode()).hexdigest(), i),
        )
        assert got == expect, d


def _write_events(tmp_path, *, user_id, event_type, value):
    """One tiny events.parquet (single file, the real fixtures' layout)
    from the three columns the NULL-semantics tests vary; the rest of
    the schema is filled deterministically."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(user_id)
    df = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": pd.to_datetime(["2024-01-01"] * n),
            "user_id": pd.array(user_id, dtype="Int64"),
            "event_type": event_type,
            "value": value,
            "props": ["{}"] * n,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


def test_approx_distinct_keeps_all_null_groups(spark, tmp_path):
    """hll_group_stats ignores NULL values in its estimate (COUNT(DISTINCT) semantics), so
    a group whose user_ids are ALL NULL never reaches the estimate
    side; with the pre-r8 inner join that dropped the group entirely,
    diverging from the upstream approx_count_distinct contract (which
    returns it with estimate 0). The left-join + coalesce must keep
    it: approx_users == 0, n == the group's row count."""
    from log2ck_spark.queries import QUERIES, load_all

    load_all()
    _write_events(
        tmp_path,
        user_id=[10, 11, None, None],
        event_type=["click", "click", "ghost", "ghost"],
        value=[1.0, 2.0, 3.0, 4.0],
    )
    rows = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"click", "ghost"}
    assert rows["ghost"]["approx_users"] == 0 and rows["ghost"]["n"] == 2
    assert rows["click"]["approx_users"] == 2 and rows["click"]["n"] == 2


def test_hll_queries_agree_with_oracle_on_null_group_keys(spark, tmp_path):
    """GROUP BY keeps a NULL group key as a real group on both
    engines, but the audit joins stitched around the shared HLL kernel
    used plain equi-joins, which never match NULL — Spark's inner join
    dropped the NULL-keyed group from sketch_hll while the DuckDB
    oracle's LEFT JOIN USING kept it (row mismatch), and
    approx_distinct's oracle COALESCEd the NULL group's estimate to 0
    while the join-free Spark side reported its real estimate (value
    mismatch). Latent on the NULL-free driver fixtures; both joins are
    now null-safe (eqNullSafe / IS NOT DISTINCT FROM), verified here
    by running query AND oracle over a fixture with a NULL event_type
    group through the driver-replica comparator."""
    import duckdb

    from log2ck_spark.queries import ORACLES, QUERIES, load_all
    from tests.oracle_harness import compare

    load_all()
    _write_events(
        tmp_path,
        user_id=[10, 11, 20, 21, None, None],
        event_type=["a", "a", None, None, "b", "b"],
        value=[1.0] * 6,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{tmp_path / 'events.parquet'}')"
    )
    for name in ("approx_distinct", "sketch_hll"):
        out = QUERIES[name](spark, str(tmp_path))
        oracle = con.execute(ORACLES[name]).fetch_df()
        assert out.count() == 3, name  # a, b, and the NULL group
        assert compare(out, oracle) == [], name
