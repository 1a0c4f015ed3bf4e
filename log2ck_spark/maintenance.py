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
