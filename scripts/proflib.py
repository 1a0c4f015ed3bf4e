"""Interactive profiling helpers for the optimization rounds.

Usage (from a REPL at the repo root):

    from scripts.proflib import *
    spark = boot()
    t("dedup_simhash")            # min-of-N noop-sink timing at sf0.1
    tdf(some_df)                  # time an arbitrary DataFrame
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log2ck_spark.queries import QUERIES, load_all  # noqa: E402
from log2ck_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def boot(cpus: int = 32):
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    load_all()
    spark = get_spark("prof")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    return spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def tdf(df, n: int = 3, label: str = "df") -> float:
    best = float("inf")
    times = []
    for _ in range(n):
        t0 = time.time()
        noop(df)
        dt = time.time() - t0
        times.append(round(dt, 3))
        best = min(best, dt)
    print(f"{label}: min {best:.3f}  runs {times}")
    return best


def t(name: str, n: int = 3, spark=None, sf: str | None = None) -> float:
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    best = float("inf")
    times = []
    for _ in range(n):
        t0 = time.time()
        noop(QUERIES[name](spark, sf or SF))
        dt = time.time() - t0
        times.append(round(dt, 3))
        best = min(best, dt)
    print(f"{name}: min {best:.3f}  runs {times}")
    return best
