"""Cross-SF scaling probe: time a representative query set at
sf0.001 / sf0.01 / sf0.1 (100x data range) and report the measured
growth factor per decade of data. A scale-sound plan grows ~linearly
in input bytes (factor <= ~10 per decade, usually far less while
fixed per-stage overhead dominates); a quadratic candidate generator
or a driver-side loop shows up as a blowing-up right column.

Usage: python scripts/scaling_probe.py [query ...]
Prints one row per query: t(0.001), t(0.01), t(0.1), and the
0.01->0.1 growth factor (the decade where data dominates overhead).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log2ck_spark.queries import QUERIES, load_all  # noqa: E402
from log2ck_spark.session import get_spark  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT_SET = [
    "tpch_q1_pricing_summary",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semantic",
    "dedup_clusters",
    "similarity_topk",
    "similarity_lsh",
    "chunk_documents",
    "pack_sequences",
    "decontaminate_span",
    "anomaly_ewma",
    "curate_pipeline",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_SET
    load_all()
    spark = get_spark("scaling-probe")
    # warm codegen/JVM off the clock at the middle SF
    for n in names:
        QUERIES[n](spark, SF_DIRS[1]).write.format("noop").mode("overwrite").save()

    print(f"{'query':32s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'x/decade':>9s}")
    for n in names:
        ts = []
        for d in SF_DIRS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                QUERIES[n](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            ts.append(best)
        factor = ts[2] / ts[1] if ts[1] > 0 else float("inf")
        print(f"{n:32s} {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f} {factor:9.2f}")


if __name__ == "__main__":
    main()
