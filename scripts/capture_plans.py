"""Capture .explain("formatted") output for headline queries.

Usage: python scripts/capture_plans.py <outdir> [name ...]

Writes <outdir>/<name>.txt for each requested query (default: the full
bench HEADLINE list) against $SPARK_GRAFT_SF_DIR (default sf0.1).
Plan generation is driver-side only — no jobs execute — except for
queries whose construction itself runs actions (staging, checkpoints);
those still produce the plan of the RETURNED DataFrame, which is the
timed computation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from log2ck_spark.queries import QUERIES, load_all  # noqa: E402
from log2ck_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    load_all()
    spark = get_spark("plan-capture")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")


if __name__ == "__main__":
    main()
