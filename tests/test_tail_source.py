"""The `tailf` custom streaming source — the reference Worker's
tail-a-growing-file semantics (A1/A2/A3): byte offsets, partial-line
buffering, start-at-EOF, mid-stream rotation pickup, truncation."""

from __future__ import annotations

import time

from log2ck_spark.sources import register_tail_source
from log2ck_spark.sources.tailsource import (
    TailStreamReader,
    _complete_span,
    _off,
)


def _wait(predicate, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.3)
    return False


# ---------------------------------------------------------------- unit


def test_complete_span_buffers_partial_line(tmp_path):
    f = tmp_path / "a.log"
    f.write_bytes(b"one\ntwo\npar")
    raw, off = _complete_span(str(f), 0)
    assert raw == b"one\ntwo\n" and off == 8  # fragment not consumed

    # writer finishes the line: next read starts at the parked offset
    f.write_bytes(b"one\ntwo\npartial\nthree\n")
    raw, off = _complete_span(str(f), off)
    assert raw == b"partial\nthree\n" and off == 22


def test_complete_span_truncation_resets(tmp_path):
    f = tmp_path / "a.log"
    f.write_bytes(b"a long first generation\n")
    _, off = _complete_span(str(f), 0)
    f.write_bytes(b"new\n")  # copytruncate: size < stored offset
    raw, off2 = _complete_span(str(f), off)
    assert raw == b"new\n" and off2 == 4


def test_complete_span_no_newline_yet(tmp_path):
    f = tmp_path / "a.log"
    f.write_bytes(b"no-newline-yet")
    raw, off = _complete_span(str(f), 0)
    assert raw == b"" and off == 0


def test_stream_reader_offsets(tmp_path):
    f = tmp_path / "app.log"
    f.write_bytes(b"old1\nold2\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log")})
    # offsets are [byte position, inode] pairs (skiphistory default)
    assert _off(r.initialOffset()[str(f)]) == 10

    r0 = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    start = r0.initialOffset()
    assert _off(start[str(f)]) == 0
    rows, end = r0.read(start)
    assert list(rows) == [(str(f), "old1"), (str(f), "old2")]
    assert _off(end[str(f)]) == 10
    # deterministic replay of the same range
    assert list(r0.readBetweenOffsets(start, end)) == [
        (str(f), "old1"),
        (str(f), "old2"),
    ]
    # new file appears mid-stream -> read from 0 even with skiphistory
    g = tmp_path / "rotated.log"
    g.write_bytes(b"fresh\n")
    rows, end2 = r0.read(end)
    assert list(rows) == [(str(g), "fresh")]
    assert _off(end2[str(g)]) == 6 and _off(end2[str(f)]) == 10


def test_stream_reader_survives_delete_and_recreate(tmp_path):
    """Log deletion mid-stream must not crash the reader, and the dead
    path's offset is PRUNED after the miss-streak grace window (a year
    of rotations must not grow the checkpoint offset log without
    bound); a recreated file restarts from 0."""
    import os

    from log2ck_spark.sources.tailsource import _MISS_DROP_TRIGGERS

    f = tmp_path / "app.log"
    f.write_bytes(b"gen1-line\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    rows, off = r.read(r.initialOffset())
    assert [v for _, v in rows] == ["gen1-line"]

    os.remove(f)
    # Grace window: the entry survives the first absent triggers with
    # a growing miss streak instead of being dropped on sight.
    for i in range(1, _MISS_DROP_TRIGGERS):
        rows, off = r.read(off)
        assert list(rows) == []
        assert off[str(f)][2] == i
    # ...and is pruned at the Nth consecutive absent trigger.
    rows, off = r.read(off)
    assert list(rows) == [] and off == {}

    f.write_bytes(b"gen2\n")  # logrotate create-mode: same name, new file
    rows, off3 = r.read(off)
    assert [v for _, v in rows] == ["gen2"]
    assert _off(off3[str(f)]) == 5


def test_transient_absence_keeps_offset_no_duplicates(tmp_path):
    """A file that vanishes for one trigger and comes back (brief
    unmount, rotate-away-then-restore of the same inode) must resume
    from its retained offset — previously the entry was dropped on
    first absence and the whole file was re-emitted from byte 0."""
    import shutil

    f = tmp_path / "app.log"
    stash = tmp_path / "stash"  # outside the *.log glob
    f.write_bytes(b"line-1\nline-2\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    rows, off = r.read(r.initialOffset())
    assert [v for _, v in rows] == ["line-1", "line-2"]

    shutil.move(str(f), str(stash))  # rotate away (same inode survives)
    rows, off = r.read(off)
    assert list(rows) == []
    assert str(f) in off  # offset retained under grace

    shutil.move(str(stash), str(f))  # restored, then appended to
    with open(f, "ab") as fh:
        fh.write(b"line-3\n")
    rows, off = r.read(off)
    # only the NEW line — no byte-0 re-read of lines 1-2
    assert [v for _, v in rows] == ["line-3"]
    # reappearance reset the miss streak to the compact 2-element form
    assert len(off[str(f)]) == 2


def test_flapping_path_cannot_outlive_grace_window(tmp_path, monkeypatch):
    """r10 ADVICE fix: a path that passes the hygiene-pass exists()
    but vanishes before the read loop's stat (the TOCTOU the except
    already tolerates) must KEEP its miss streak, not have it reset to
    the compact form — otherwise a repeatedly racing path restarts its
    grace window every trigger and a dead checkpoint entry lives
    forever. The streak resets only on a successful stat/read."""
    import os

    import log2ck_spark.sources.tailsource as ts

    f = tmp_path / "app.log"
    f.write_bytes(b"one\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    rows, off = r.read(r.initialOffset())
    assert [v for _, v in rows] == ["one"]

    os.remove(f)
    rows, off = r.read(off)
    assert off[str(f)][2] == 1  # first absent trigger: streak 1

    # flap: exists() says alive, but the file is NOT there for the
    # glob/stat — the entry must carry the PRIOR streak, not reset it
    real_exists = ts.os.path.exists
    monkeypatch.setattr(
        ts.os.path, "exists", lambda p: p == str(f) or real_exists(p)
    )
    rows, off = r.read(off)
    assert off[str(f)][2] == 1  # streak preserved, not reset
    monkeypatch.undo()

    # absence continues: streak resumes from 1, pruned on schedule
    rows, off = r.read(off)
    assert off[str(f)][2] == 2
    rows, off = r.read(off)
    assert str(f) not in off  # pruned at the 3rd consecutive absence


def test_create_mode_rotation_with_larger_replacement(tmp_path):
    """logrotate create-mode where the REPLACEMENT grows past the old
    offset between triggers: same path, new inode, size ABOVE the
    stored offset — undetectable from size alone (the old code seeked
    to the stale offset, silently losing the new file's head and
    emitting a mid-line fragment). The inode in the offset pair
    detects it and restarts from 0."""
    import os

    f = tmp_path / "app.log"
    f.write_bytes(b"aaaa\n")  # 5 bytes
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    rows, off = r.read(r.initialOffset())
    assert [v for _, v in rows] == ["aaaa"]

    # rotate: rename away, create fresh file that is ALREADY LARGER
    os.rename(f, tmp_path / "app.log.1")
    f.write_bytes(b"first-new-line\nsecond\n")  # 22 bytes > offset 5
    rows, off2 = r.read(off)
    got = [v for p, v in rows if p == str(f)]
    assert got == ["first-new-line", "second"]  # head NOT lost
    assert _off(off2[str(f)]) == 22

    # recovery replay of that batch re-reads the new file from 0
    replayed = [
        v for p, v in r.readBetweenOffsets(off, off2) if p == str(f)
    ]
    assert replayed == ["first-new-line", "second"]


def test_replay_after_truncation_inside_batch(tmp_path):
    """Crash-recovery replay of a batch that observed a copytruncate:
    read() reset the file to 0 and committed end < start; the replay
    must re-emit bytes [0, stop) instead of skipping the file (which
    silently dropped the batch before this fix)."""
    f = tmp_path / "app.log"
    f.write_bytes(b"a very long first generation line\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    start0 = r.initialOffset()
    rows, off1 = r.read(start0)
    assert [v for _, v in rows] == ["a very long first generation line"]

    f.write_bytes(b"new1\nnew2\n")  # copytruncate: size 10 < offset 34
    rows, off2 = r.read(off1)
    assert [v for _, v in rows] == ["new1", "new2"]
    assert _off(off2[str(f)]) == 10 < _off(off1[str(f)])

    # the recovery path must replay exactly what the original batch saw
    replayed = list(r.readBetweenOffsets(off1, off2))
    assert [v for _, v in replayed] == ["new1", "new2"]


def test_read_survives_mid_trigger_file_vanish(tmp_path):
    """TOCTOU: a file listed by the glob but deleted before the
    stat/read (logrotate rename+unlink) must count as 0 new bytes, not
    crash the stream."""
    f = tmp_path / "app.log"
    f.write_bytes(b"x\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    ghost = str(tmp_path / "ghost.log")
    r._files = lambda: [ghost, str(f)]  # glob says it exists; disk says no
    rows, end = r.read({})
    assert [v for _, v in rows] == ["x"]
    assert ghost not in end  # no offset invented for the vanished file

    # replay with a committed range for a since-vanished file: skipped
    assert list(r.readBetweenOffsets({}, {ghost: 5})) == []


def test_multi_megabyte_append_single_trigger(tmp_path):
    """Memory-bound claim: one trigger consuming a multi-MB append
    yields every line exactly once and parks the offset at EOF."""
    f = tmp_path / "big.log"
    f.write_bytes(b"")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    start = r.initialOffset()
    n = 80_000  # ~5.5 MB of 70-byte lines
    line = b"x" * 69 + b"\n"
    with open(f, "ab") as fh:
        for _ in range(n):
            fh.write(line)
    rows, end = r.read(start)
    rows = list(rows)
    assert len(rows) == n
    assert _off(end[str(f)]) == n * 70
    # nothing left: the follow-up trigger is empty
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end


def test_many_files_glob_per_trigger_latency_flat(tmp_path):
    """Hundreds of files in the glob: an idle trigger (no new bytes)
    stays cheap — pure stat() cost, no content reads."""
    import time as _t

    n_files = 300
    for i in range(n_files):
        (tmp_path / f"f{i:03d}.log").write_bytes(b"one line\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert len(list(rows)) == n_files
    # two idle triggers: no rows, and well under a second each
    for _ in range(2):
        t0 = _t.monotonic()
        rows, end = r.read(end)
        assert list(rows) == []
        assert _t.monotonic() - t0 < 1.0


# ------------------------------------------------------------- batch


def test_batch_read_snapshot_includes_unterminated_line(spark, tmp_path):
    (tmp_path / "a.log").write_bytes(b"x\ny\ntail-no-nl")
    register_tail_source(spark)
    df = (
        spark.read.format("tailf")
        .option("path", str(tmp_path / "*.log"))
        .load()
    )
    assert [r.value for r in df.collect()] == ["x", "y", "tail-no-nl"]


# --------------------------------------------------------- streaming


def test_stream_pipeline_follow_mode_parses_tailed_lines(spark, tmp_path):
    """follow=True routes stream_pipeline through the tailf source and
    the normal parse chain: appended monolog lines come out parsed."""
    from log2ck_spark.config import EngineConfig, TailSpec
    from log2ck_spark.pipeline import stream_pipeline

    f = tmp_path / "app.log"
    f.write_bytes(b"")
    tail = TailSpec(
        name="t1",
        path=str(tmp_path / "*.log"),
        repo="r1",
        follow=True,
        skip_history=False,
    )
    rows, _dead = stream_pipeline(spark, EngineConfig(tails=[tail]), tail)
    q = (
        rows.writeStream.format("memory")
        .queryName("tailf_pipe")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        with open(f, "ab") as fh:
            fh.write(b"[2024-01-01 10:00:00] app.INFO: hello {} []\n")
            fh.flush()
        got = lambda: spark.sql(
            "SELECT message, level, repo FROM tailf_pipe"
        ).collect()
        assert _wait(lambda: len(got()) == 1), got()
        (r,) = got()
        assert (r.message, r.level, r.repo) == ("hello", "INFO", "r1")
    finally:
        q.stop()
        q.awaitTermination(30)


def test_tailf_checkpoint_restart_resumes_offsets(spark, tmp_path):
    """A2 for the custom source: stop a tailf query, append more bytes,
    restart from the same checkpoint — appended lines arrive exactly
    once, nothing is re-emitted, nothing is lost."""
    f = tmp_path / "app.log"
    f.write_bytes(b"")
    register_tail_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("tailf")
            .option("path", str(tmp_path / "*.log"))
            .option("skiphistory", "false")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def values():
        try:
            return sorted(r.value for r in spark.read.parquet(out).collect())
        except Exception:
            return []

    q = start()
    try:
        with open(f, "ab") as fh:
            fh.write(b"a1\na2\n")
        assert _wait(lambda: values() == ["a1", "a2"]), values()
    finally:
        q.stop()
        q.awaitTermination(30)

    # offline append while no query runs
    with open(f, "ab") as fh:
        fh.write(b"b1\nb2\n")

    q = start()
    try:
        assert _wait(lambda: values() == ["a1", "a2", "b1", "b2"]), values()
        # a few extra triggers must not duplicate anything
        time.sleep(1.0)
        assert values() == ["a1", "a2", "b1", "b2"]
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_tail_growing_file_end_to_end(spark, tmp_path):
    """Start at EOF (history skipped), append complete + partial lines,
    see only complete ones; finish the partial line, see it arrive."""
    f = tmp_path / "app.log"
    f.write_bytes(b"history1\nhistory2\n")
    register_tail_source(spark)
    q = (
        spark.readStream.format("tailf")
        .option("path", str(tmp_path / "*.log"))
        .load()
        .writeStream.format("memory")
        .queryName("tailf_e2e")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        seen = lambda: {r.value for r in spark.sql("SELECT * FROM tailf_e2e").collect()}

        # initialOffset (the EOF pin) is computed at the FIRST trigger;
        # appending before that would legitimately be skipped as
        # history. Wait until the stream has made progress.
        assert _wait(lambda: q.lastProgress is not None)

        with open(f, "ab") as fh:
            fh.write(b"live1\nlive2\nhalf")
            fh.flush()
        assert _wait(lambda: {"live1", "live2"} <= seen())
        time.sleep(1.0)  # a few triggers: the fragment must NOT appear
        assert "half" not in seen() and "history1" not in seen()

        with open(f, "ab") as fh:
            fh.write(b"done\nlive3\n")
            fh.flush()
        assert _wait(lambda: {"halfdone", "live3"} <= seen()), seen()
        assert "half" not in seen()
    finally:
        q.stop()
        q.awaitTermination(30)


def test_legacy_int_offset_gets_no_grace_window(tmp_path):
    """A pre-inode checkpoint stores plain-int offsets. Such an entry
    must NOT get the absence grace window: without an inode, a
    reappearing file cannot be told apart from a NEW file created at
    the same path, and resuming a new file at the old offset would
    skip its head — data loss, strictly worse than the duplicate
    re-read that dropping the entry costs. So: drop on first absence;
    whatever appears at the path later is read from byte 0."""
    import shutil

    f = tmp_path / "app.log"
    stash = tmp_path / "stash"
    f.write_bytes(b"one\ntwo\n")
    r = TailStreamReader({"path": str(tmp_path / "*.log"), "skiphistory": "false"})
    legacy = {str(f): 8}  # plain int, as a pre-r8 checkpoint would hold

    shutil.move(str(f), str(stash))
    rows, off = r.read(legacy)  # absent: dropped immediately, no crash
    assert list(rows) == [] and off == {}

    # a NEW file at the same path: its head must not be skipped
    f.write_bytes(b"fresh-head\nfresh-tail\n")
    rows, off = r.read(off)
    assert [v for _, v in rows] == ["fresh-head", "fresh-tail"]
    assert _off(off[str(f)]) == 22
