"""Multi-tail concurrency (VERDICT r12 item 5): the reference's
parallelism unit is one PROCESS per tail (`Manager.php:95-108`); this
engine runs one STREAMING QUERY per tail inside one SparkSession. These
tests drive N concurrent tails through the full tailf → parse →
validate pipeline at once and measure aggregate delivered rows/s,
asserting (a) completeness per stream — every line of every tail
arrives exactly once, no cross-stream leakage — and (b) no
head-of-line blocking: the N-tail drain completes in far less than N ×
the per-tail budget (concurrent queries share the scheduler pool; a
serialized engine would scale linearly). The measured numbers feed
SCALE.md's multi-tail row; wall-clock-bound, so marked slow.
"""

from __future__ import annotations

import threading
import time

import pytest

pytestmark = pytest.mark.slow

LINES_PER_TAIL = 400
LINE = "[2024-01-01 10:00:%02d] app.INFO: m%d {} []\n"


def _drive(spark, tmp_path, n_tails: int) -> dict:
    from log2ck_spark.config import EngineConfig, TailSpec
    from log2ck_spark.pipeline import stream_pipeline

    tails = []
    files = []
    for i in range(n_tails):
        d = tmp_path / f"tail{i}"
        d.mkdir()
        f = d / "app.log"
        f.write_bytes(b"")
        files.append(f)
        tails.append(
            TailSpec(
                name=f"t{i}",
                path=str(d / "*.log"),
                repo=f"repo{i}",
                follow=True,
                skip_history=False,
            )
        )
    cfg = EngineConfig(tails=tails)
    queries = []
    try:
        for i, tail in enumerate(tails):
            rows, _dead = stream_pipeline(spark, cfg, tail)
            queries.append(
                rows.writeStream.format("memory")
                .queryName(f"mt_{n_tails}_{i}")
                .trigger(processingTime="300 milliseconds")
                .start()
            )

        def _append(f):
            # one writer per tail, interleaved flushes — the
            # reference's "N independent producers" shape
            with open(f, "ab") as fh:
                for k in range(LINES_PER_TAIL):
                    fh.write((LINE % (k % 60, k)).encode())
                    if k % 50 == 49:
                        fh.flush()
                fh.flush()

        t0 = time.time()
        writers = [
            threading.Thread(target=_append, args=(f,)) for f in files
        ]
        for w in writers:
            w.start()
        for w in writers:
            w.join()

        def _count(i):
            return spark.sql(
                f"SELECT COUNT(*) c FROM mt_{n_tails}_{i}"
            ).collect()[0].c

        deadline = time.time() + 120
        while time.time() < deadline:
            if all(_count(i) >= LINES_PER_TAIL for i in range(n_tails)):
                break
            time.sleep(0.3)
        drain_s = time.time() - t0

        counts = [_count(i) for i in range(n_tails)]
        repos = [
            {
                r.repo
                for r in spark.sql(
                    f"SELECT DISTINCT repo FROM mt_{n_tails}_{i}"
                ).collect()
            }
            for i in range(n_tails)
        ]
        return {
            "counts": counts,
            "repos": repos,
            "drain_s": drain_s,
            "agg_rows_per_s": round(
                n_tails * LINES_PER_TAIL / max(drain_s, 1e-6)
            ),
        }
    finally:
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination(30)


@pytest.mark.parametrize("n_tails", [4, 16])
def test_concurrent_tails_complete_without_hol_blocking(
    spark, tmp_path, n_tails
):
    got = _drive(spark, tmp_path, n_tails)
    # completeness: exactly every line of every tail, no leakage
    assert got["counts"] == [LINES_PER_TAIL] * n_tails, got["counts"]
    for i, rs in enumerate(got["repos"]):
        assert rs == {f"repo{i}"}, (i, rs)
    print(
        f"\nmulti-tail n={n_tails}: drain={got['drain_s']:.1f}s "
        f"aggregate={got['agg_rows_per_s']} rows/s"
    )
    # no head-of-line blocking: N concurrent drains must finish far
    # inside N x a generous single-tail budget (30 s covers a cold
    # 300 ms-trigger stream on a loaded box; a serialized engine
    # would need ~N x the single-tail time)
    assert got["drain_s"] < 30 + 2 * n_tails, got
