"""True tail-a-growing-file streaming source (SURVEY.md §2 A1/A2/A3).

The reference worker tails one file with byte offsets: seek to the
stored offset, read complete lines, BUFFER any trailing partial line
until more bytes arrive, and persist the offset only after a
successful sink insert (`/root/reference/src/Worker.php:101-107,
123-124`); with no cached offset it starts at the file's END, skipping
history (`Worker.php:176`).

Spark's built-in file stream can't do any of that — it only ingests
whole closed files. This module supplies the missing semantics as a
Python Data Source (`spark.readStream.format("tailf")`) so the rest of
the engine stays declarative:

* per-file BYTE offsets, checkpointed through Spark's own offset log —
  resume/replay (A2) is handled by the engine, not by us;
* partial-line buffering expressed as "the offset only ever advances
  past the last complete newline", so a half-written line is re-read
  on the next micro-batch instead of being emitted broken;
* `skiphistory` (default true, the reference default): the initial
  offset of every pre-existing file is its current size;
* glob re-expansion every micro-batch: a rotated/new daily file (A3)
  is picked up mid-stream at offset 0;
* copytruncate rotation: a file that SHRANK below its stored offset
  restarts from 0;
* create-mode rotation (logrotate's default: rename away + create a
  fresh file at the same path): offsets carry the file's INODE, so a
  same-path file whose inode changed restarts from 0 even when the
  replacement has already grown PAST the stored offset — size alone
  cannot tell "new file, 6000 bytes" from "old file grew to 6000";
* offset hygiene: a path that no longer exists on disk is dropped
  from the offset dict (its committed bytes were emitted in earlier
  batches), so a year of daily rotations cannot grow the checkpoint
  offset log without bound.

Scale posture: a SimpleDataSourceStreamReader runs on the driver —
correct for tailing (the reference is likewise one process per tail;
the OS page cache serves the reads), and each tail is one lightweight
stream. Fan-out across thousands of files belongs to the closed-file
bulk path (`spark.readStream.text`), not a tailer.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("path", StringType(), nullable=False),
        StructField("value", StringType(), nullable=False),
    ]
)


# Offset-dict values are [byte offset, inode] pairs; legacy checkpoints
# (plain int offsets, pre-inode) are still readable.
def _off(v) -> int:
    return int(v[0]) if isinstance(v, (list, tuple)) else int(v)


def _ino(v) -> "int | None":
    # v[1] can be None for a legacy plain-int offset that later grew a
    # miss-streak ([off, None, streak]) — int(None) must not raise
    if isinstance(v, (list, tuple)) and len(v) > 1 and v[1] is not None:
        return int(v[1])
    return None


def _miss(v) -> int:
    """Consecutive triggers the path has been absent (offset element 3,
    absent/0 on the common live-file entries so their offsets stay the
    compact 2-element form)."""
    return int(v[2]) if isinstance(v, (list, tuple)) and len(v) > 2 else 0


# A path's offset entry is dropped at its Nth consecutive absent
# trigger (i.e. it rides out N-1 absent triggers). 1 trigger of grace
# already covers the pure rename+unlink TOCTOU; 3 also rides out a
# brief unmount or a rotate-away-then-restore of the same inode, where
# dropping the entry would re-emit the whole file from byte 0 when it
# reappears.
_MISS_DROP_TRIGGERS = 3


def _complete_span(
    path: str, start: int, size: "int | None" = None
) -> tuple[bytes, int]:
    """Bytes of COMPLETE lines in `path` from offset `start`, plus the
    new offset (start + bytes consumed). The stream reader stats the
    file once (size + inode) and passes `size`; standalone callers may
    omit it. A trailing partial line is not consumed — the offset
    parks just past the last newline, so the fragment is re-read once
    the writer finishes it."""
    if size is None:
        size = os.path.getsize(path)
    if size < start:  # truncated in place (copytruncate rotation)
        start = 0
    if size == start:
        return b"", start
    with open(path, "rb") as f:
        f.seek(start)
        chunk = f.read(size - start)
    last_nl = chunk.rfind(b"\n")
    if last_nl < 0:
        return b"", start  # only a partial line so far — buffer it
    return chunk[: last_nl + 1], start + last_nl + 1


def _lines(raw: bytes, path: str) -> Iterator[tuple[str, str]]:
    for line in raw.decode("utf-8", errors="replace").splitlines():
        yield (path, line)


class TailStreamReader(SimpleDataSourceStreamReader):
    """Offset = {file path: [next unread byte, inode]} (legacy plain
    ints accepted on read)."""

    def __init__(self, options: dict):
        self.pattern = options.get("path", "")
        if not self.pattern:
            raise ValueError("tailf requires a 'path' option (file or glob)")
        self.skip_history = (
            str(options.get("skiphistory", "true")).lower() != "false"
        )

    def _files(self) -> list[str]:
        return sorted(p for p in glob.glob(self.pattern) if os.path.isfile(p))

    def initialOffset(self) -> dict:
        out = {}
        for p in self._files():
            try:
                st = os.stat(p)
            except FileNotFoundError:
                continue  # vanished between glob and stat — next trigger
            out[p] = [st.st_size if self.skip_history else 0, st.st_ino]
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple[str, str]], dict]:
        # Rows are MATERIALIZED (not a generator): the engine's
        # prefetch cache pickles the returned iterator to ship it to
        # the executor side, and generators don't pickle. Memory is
        # bounded by bytes appended since the previous trigger.
        #
        # Offset hygiene: a path gone from disk had its committed bytes
        # emitted in earlier batches, and keeping it forever would grow
        # the checkpoint offset log by one dead entry per rotated file.
        # But dropping on FIRST absence loses the offset of a file
        # that's only transiently unavailable (brief unmount,
        # rotate-away-then-restore of the same inode) — when it
        # reappears it would re-read from byte 0 and duplicate every
        # previously emitted line. So an absent path's entry survives
        # with an incremented miss-streak (3rd offset element) and is
        # dropped only after _MISS_DROP_TRIGGERS consecutive absent
        # triggers; the streak resets ONLY on a successful stat/read
        # in the files loop below (r10 ADVICE fix: resetting here on a
        # bare exists() let a path that repeatedly vanishes between
        # exists() and stat() — the TOCTOU the read loop tolerates —
        # restart its grace window every trigger and keep a dead
        # checkpoint entry alive indefinitely).
        end: dict = {}
        for p, v in start.items():
            if os.path.exists(p):
                if _ino(v) is None:
                    end[p] = v
                elif _miss(v):
                    end[p] = [_off(v), _ino(v), _miss(v)]  # keep streak
                else:
                    end[p] = [_off(v), _ino(v)]
            elif _ino(v) is not None and (
                streak := _miss(v) + 1
            ) < _MISS_DROP_TRIGGERS:
                end[p] = [_off(v), _ino(v), streak]
            # Inode-LESS (legacy plain-int) entries drop on first
            # absence, the pre-grace behavior: without an inode, a
            # reappearing file cannot be told apart from a NEW file
            # created at the same path, and resuming a new file at the
            # old offset would skip its head and emit a mid-line
            # fragment — data loss, strictly worse than the duplicate
            # re-read the grace window exists to prevent.
        rows: list[tuple[str, str]] = []
        for p in self._files():
            prev = start.get(p, 0)
            try:
                st = os.stat(p)
                offset = _off(prev)
                known_ino = _ino(prev)
                if known_ino is not None and st.st_ino != known_ino:
                    # Create-mode rotation: same path, NEW file. Size
                    # alone cannot detect this once the replacement
                    # grows past the stored offset — seek would skip
                    # its head and emit a mid-line fragment.
                    offset = 0
                raw, new_off = _complete_span(p, offset, st.st_size)
            except FileNotFoundError:
                # TOCTOU: the file vanished between the glob and the
                # stat/read (logrotate's rename+unlink does exactly
                # this). Treat as 0 new bytes this trigger; the next
                # glob re-expansion drops or re-adds the path.
                continue
            end[p] = [new_off, st.st_ino]
            if raw:
                rows.extend(_lines(raw, p))
        return iter(rows), end

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple[str, str]]:
        """Deterministic replay for recovery: re-read exactly the byte
        ranges the committed offsets span.

        A committed `stop` BELOW `begin` means the original batch saw a
        copytruncate rotation (read() reset a shrunken file to 0 and
        emitted bytes [0, stop)) — replay that range, do NOT skip it,
        or recovery would silently drop a batch the original run
        emitted. An inode CHANGE between the two offsets means the
        original batch saw a create-mode rotation and read the new
        file from 0 — same rule."""
        rows: list[tuple[str, str]] = []
        for p, committed in sorted(end.items()):
            prev = start.get(p, 0)
            begin, stop = _off(prev), _off(committed)
            if stop < begin:
                begin = 0  # truncation happened inside the batch
            b_ino, e_ino = _ino(prev), _ino(committed)
            if b_ino is not None and e_ino is not None and b_ino != e_ino:
                begin = 0  # rotation (new inode) happened inside the batch
            if stop <= begin:
                continue
            try:
                with open(p, "rb") as f:
                    f.seek(begin)
                    raw = f.read(stop - begin)
            except FileNotFoundError:
                continue  # vanished since — nothing left to replay
            rows.extend(_lines(raw, p))
        return iter(rows)

    def commit(self, end: dict) -> None:
        # Offsets live in Spark's checkpoint offset/commit logs (the
        # engine calls commit after the sink batch succeeds — the same
        # "advance only after insert" contract as Worker.php:123-124).
        pass


class TailBatchReader(DataSourceReader):
    """Batch analog: whole current contents of every matched file,
    including a final unterminated line (a batch read is a snapshot,
    not a tail)."""

    def __init__(self, options: dict):
        self.pattern = options.get("path", "")
        if not self.pattern:
            raise ValueError("tailf requires a 'path' option (file or glob)")

    def read(self, partition) -> Iterator[tuple[str, str]]:
        for p in sorted(glob.glob(self.pattern)):
            if not os.path.isfile(p):
                continue
            with open(p, "rb") as f:
                yield from _lines(f.read(), p)


class TailFileDataSource(DataSource):
    """`spark.read/readStream.format("tailf").option("path", glob)`.

    Options: `path` (file or glob, required), `skiphistory`
    ("true"/"false", streaming only, default "true" — matches the
    reference's no-offset-cache behavior, Worker.php:176)."""

    @classmethod
    def name(cls) -> str:
        return "tailf"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema) -> TailBatchReader:
        return TailBatchReader(self.options)

    def simpleStreamReader(self, schema) -> TailStreamReader:
        return TailStreamReader(self.options)


def register_tail_source(spark) -> None:
    """Idempotent registration of the `tailf` format on a session."""
    try:
        spark.dataSource.register(TailFileDataSource)
    except Exception as e:  # already registered → keep going
        if "already" not in str(e).lower():
            raise
