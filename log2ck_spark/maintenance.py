"""TTL retention job (B3) — the reference's `TTL created_at + INTERVAL
10 DAY` (`/root/reference/readme.md:123`) as a partition-drop job.

Because the sink is partitioned by date (B1), TTL is a metadata-only
operation: delete expired `log_date=YYYY-MM-DD` directories. No scan,
no rewrite — O(expired partitions) regardless of table size, which is
the only TTL that works at 100 TB.
"""

from __future__ import annotations

import os
import shutil
from datetime import date, timedelta


def expired_partitions(
    table_path: str, ttl_days: int, today: date | None = None,
    partition_col: str = "log_date",
) -> list[str]:
    today = today or date.today()
    cutoff = (today - timedelta(days=ttl_days)).isoformat()
    out = []
    if not os.path.isdir(table_path):
        return out
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(table_path)):
        if entry.startswith(prefix) and entry[len(prefix):] < cutoff:
            out.append(os.path.join(table_path, entry))
    return out


def ttl_expire_partitions(
    table_path: str, ttl_days: int, today: date | None = None,
    partition_col: str = "log_date",
) -> list[str]:
    """Drop partition directories older than the TTL. Returns dropped
    paths. On object storage this maps to a bulk prefix delete."""
    dropped = expired_partitions(table_path, ttl_days, today, partition_col)
    for path in dropped:
        shutil.rmtree(path)
    return dropped


def small_file_partitions(
    table_path: str, max_files: int, partition_col: str = "log_date"
) -> list[str]:
    """Partitions whose parquet file count exceeds `max_files` —
    the compaction work list. Streaming sinks produce one file per
    (trigger, writer task); over days a hot date accretes thousands
    of small files, and scan planning cost grows with file count."""
    out = []
    if not os.path.isdir(table_path):
        return out
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(table_path)):
        part = os.path.join(table_path, entry)
        if not entry.startswith(prefix) or not os.path.isdir(part):
            continue
        n = sum(1 for f in os.listdir(part) if f.endswith(".parquet"))
        if n > max_files:
            out.append(part)
    return out


_TMP_SUFFIX = ".compact_tmp"
_OLD_SUFFIX = ".compact_old"


def _hidden_sibling(part: str, suffix: str) -> str:
    """A dot-prefixed sibling path: Spark's file index skips names
    starting with '.' or '_', so in-flight compaction state is
    invisible to partition discovery AND cannot be parsed as a bogus
    `log_date=...` partition value (the old `part + '._compact_tmp'`
    naming kept the `log_date=` prefix and leaked into reads)."""
    parent, name = os.path.split(part)
    return os.path.join(parent, f".{name}{suffix}")


def recover_compaction(table_path: str) -> list[str]:
    """Roll back any half-finished swap from a crashed compaction run.

    Invariant of compact_partitions' rename sequence: at every crash
    point either the live dir or its `.…compact_old` sibling holds the
    full pre-compaction data. Recovery: if the live dir is missing,
    rename the old dir back; then delete every leftover hidden
    tmp/old dir. Returns the paths restored."""
    restored = []
    if not os.path.isdir(table_path):
        return restored
    for entry in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, entry)
        if entry.startswith(".") and entry.endswith(_OLD_SUFFIX):
            live = os.path.join(table_path, entry[1 : -len(_OLD_SUFFIX)])
            if not os.path.isdir(live):
                os.rename(full, live)
                restored.append(live)
            else:
                shutil.rmtree(full)
        elif entry.startswith(".") and entry.endswith(_TMP_SUFFIX):
            shutil.rmtree(full)
    return restored


def compact_partitions(
    spark,
    table_path: str,
    max_files: int = 8,
    target_files: int = 1,
    partition_col: str = "log_date",
    sort_col: str = "created_at",
) -> list[str]:
    """Rewrite small-file partitions into `target_files` sorted files
    each. Returns the compacted partition paths.

    Scale posture: work is O(bytes in oversized partitions only) —
    healthy partitions are never touched, so a daily compaction pass
    over a 100 TB table rewrites just the most recent date(s). Each
    partition is rewritten independently (repartition(target) +
    sortWithinPartitions to restore the B2 data-skipping layout).

    Crash safety: the rewrite lands in a HIDDEN sibling dir (ignored
    by partition discovery), then a two-rename swap (live→.old,
    .tmp→live) publishes it. A crash at any point leaves the full data
    in either the live dir or the hidden .old dir — never a mix, never
    a half-visible partition — and `recover_compaction` (run first,
    idempotent) rolls the table back to a clean state. On object
    storage the same job runs against prefixes; transactional formats
    (Delta/Iceberg) replace the swap with a metadata commit."""
    recover_compaction(table_path)
    compacted = []
    for part in small_file_partitions(table_path, max_files, partition_col):
        tmp = _hidden_sibling(part, _TMP_SUFFIX)
        (
            spark.read.parquet(part)
            .repartition(target_files)
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = _hidden_sibling(part, _OLD_SUFFIX)
        os.rename(part, old)
        os.rename(tmp, part)
        shutil.rmtree(old)
        compacted.append(part)
    return compacted


def delete_rows(
    spark,
    table_path: str,
    predicate: str,
    partition_col: str = "log_date",
) -> dict:
    """Targeted delete (right-to-erasure / bad-batch rollback): remove
    every row matching `predicate` (a SQL boolean over DATA columns)
    by rewriting ONLY the partitions that contain matches — the
    parquet-table answer to ClickHouse's `ALTER TABLE ... DELETE
    WHERE` mutations.

    Scale posture: the discovery scan is predicate-pushed (touched
    row groups only) and projects just the partition column, so a
    user-erasure over a 100 TB table costs one pruned scan plus a
    rewrite of the handful of dates the user appears in; untouched
    partitions keep their exact files (asserted in tests). Each
    rewrite reuses compaction's hidden-sibling two-rename swap, so a
    crash at ANY point leaves every partition either fully old or
    fully new — `recover_compaction` (run first here, idempotent)
    rolls back half-finished swaps from prior crashes. Transactional
    formats would replace the swap with a metadata commit.

    Returns {"partitions_rewritten": [...], "rows_deleted": n}.
    """
    recover_compaction(table_path)
    table = spark.read.parquet(table_path)
    affected = [
        str(r[0])
        for r in table.filter(predicate)
        .select(partition_col)
        .distinct()
        .collect()
    ]
    rewritten, deleted = [], 0
    for value in sorted(affected):
        part = os.path.join(table_path, f"{partition_col}={value}")
        if not os.path.isdir(part):
            continue
        # a single-partition read loses the partition column (it lives
        # in the dir name); re-inject it as a literal so the predicate
        # may reference it, and drop it again before writing (the
        # rewritten files must not embed the partition column)
        from pyspark.sql import functions as _F

        before = spark.read.parquet(part).withColumn(
            partition_col, _F.lit(value)
        )
        # SQL DELETE WHERE semantics: only rows where the predicate is
        # TRUE are deleted; NULL-predicate rows are RETAINED (three-
        # valued logic — `NOT (v < 100)` would silently drop a NULL v
        # row without counting it, diverging from ClickHouse ALTER
        # DELETE and ANSI DELETE).
        n_match = before.filter(f"({predicate}) IS TRUE").count()
        if n_match == 0:
            continue
        tmp = _hidden_sibling(part, _TMP_SUFFIX)
        (
            before.filter(f"({predicate}) IS NOT TRUE")
            .drop(partition_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = _hidden_sibling(part, _OLD_SUFFIX)
        os.rename(part, old)
        os.rename(tmp, part)
        shutil.rmtree(old)
        rewritten.append(part)
        deleted += n_match
    return {"partitions_rewritten": rewritten, "rows_deleted": deleted}


def materialize_shards(
    spark,
    docs,
    out_path: str,
    n_shards: int = 32,
    seed: int = 42,
    id_col: str = "doc_id",
) -> int:
    """Write a training corpus in deterministic shuffled order: the
    shuffle_shards layout (md5(id:seed) → shard + in-shard hash
    order) materialized as ONE SORTED PARQUET FILE PER SHARD under
    `out_path/shard=N/`. Readers stream shards in index order and
    rows in file order to reproduce the exact global shuffle —
    byte-identical across reruns, resumable mid-epoch at any
    (shard, row) cursor, reshuffled by changing `seed`.

    Plan: one hash repartition ON THE SHARD COLUMN (so each output
    task owns exactly one shard) + an in-partition sort — no global
    sort, no driver state; at 100 TB pick n_shards = 2-4x task slots
    and each task sorts ~corpus/n_shards locally. Returns n_shards.
    """
    from pyspark.sql import functions as F

    key = F.concat_ws(":", F.col(id_col), F.lit(seed))
    hashed = docs.withColumn("_h", F.md5(key)).withColumn(
        "shard",
        (F.conv(F.substring("_h", 1, 8), 16, 10).cast("bigint") % n_shards),
    )
    (
        # sort key LEADS with the partition column: the dynamic-
        # partition writer requires ordering by partition cols and
        # would otherwise insert its own (non-stable) sort by shard,
        # destroying the in-shard hash order
        hashed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_h", id_col)
        .drop("_h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_path)
    )
    return n_shards
