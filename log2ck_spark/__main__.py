"""CLI runtime — `python -m log2ck_spark --config cfg.json`.

The operational surface of the reference (`php Manager.php`,
`/root/reference/src/Manager.php:29-47`: load config, spawn one worker
per tail, supervise until signalled) expressed on Spark: one streaming
query per tail, the ops listener for A14 logging, and a signal-driven
graceful stop (A12). Supervision/restart (A13) is the engine's
restart-from-checkpoint — rerunning this command resumes every tail
exactly where its offset log left it.
"""

from __future__ import annotations

import argparse
import signal
import sys
import time

from log2ck_spark.config import load_config
from log2ck_spark.session import get_spark
from log2ck_spark.streaming import OpsLogListener, run_ingest_stream, stop_all


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m log2ck_spark",
        description="Tail log files into the configured sink (Spark "
        "Structured Streaming).",
    )
    ap.add_argument("--config", required=True, help=".json or .py config file")
    ap.add_argument("--cpus", type=int, default=None, help="local cores")
    ap.add_argument(
        "--duration",
        type=float,
        default=None,
        help="run for N seconds then stop gracefully (default: until signal)",
    )
    ap.add_argument(
        "--ops-log-dir", default=None, help="A14 operational log directory"
    )
    args = ap.parse_args(argv)

    config = load_config(args.config)
    spark = get_spark("log2ck", cpus=args.cpus)
    if args.ops_log_dir:
        spark.streams.addListener(
            OpsLogListener(log_dir=args.ops_log_dir, echo=True)
        )

    queries = []
    for tail in config.tails:
        q = run_ingest_stream(spark, config, tail, with_dead_letter=True)
        queries.extend(q if isinstance(q, tuple) else (q,))
        print(f"started tail '{tail.name}' <- {tail.path}", flush=True)

    stopping = False

    def _stop(signum, frame):  # A12: SIGTERM/SIGINT -> graceful stop
        nonlocal stopping
        stopping = True

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)

    deadline = time.time() + args.duration if args.duration else None
    try:
        while not stopping and any(q.isActive for q in queries):
            if deadline and time.time() >= deadline:
                break
            failed = [q for q in queries if q.exception() is not None]
            if failed:
                for q in failed:
                    print(f"query failed: {q.exception()}", file=sys.stderr)
                stop_all(spark)
                return 1
            time.sleep(0.5)
    finally:
        stop_all(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
