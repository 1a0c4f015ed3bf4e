"""scratch_dir isolation and staleness semantics — no Spark needed.

The r6 advisor found that the delete-by-label-prefix cleanup keyed the
label on basename(source) only: two distinct corpora sharing a basename
(.../a/sf0.01 vs .../b/sf0.01) would rmtree each other's staging on
every alternation — including out from under a live Spark scan. The
label now folds in a short hash of the full source path, so only true
regenerations of the SAME corpus match the prefix.
"""

from __future__ import annotations

import os

from log2ck_spark import io


def _mkcorpus(root, name):
    d = root / name / "sf0.01"
    d.mkdir(parents=True)
    (d / "t.parquet").write_bytes(b"x" * 16)
    return str(d)


def test_same_basename_different_corpora_do_not_evict_each_other(tmp_path):
    a = _mkcorpus(tmp_path, "a")
    b = _mkcorpus(tmp_path, "b")
    pa = io.scratch_dir(a, "docs")
    os.makedirs(pa, exist_ok=True)
    (open(os.path.join(pa, "_SUCCESS"), "w")).close()
    pb = io.scratch_dir(b, "docs")  # same basename, different corpus
    assert pa != pb
    # Computing b's path must NOT have deleted a's live staging.
    assert os.path.exists(os.path.join(pa, "_SUCCESS"))
    # And alternating back is still a pure path computation.
    assert io.scratch_dir(a, "docs") == pa
    assert os.path.exists(os.path.join(pa, "_SUCCESS"))


def test_regenerated_same_corpus_is_evicted_in_place(tmp_path):
    """The original purpose of the prefix delete must survive the fix:
    an in-place testdata regeneration (same path, new content
    fingerprint) lands in a fresh dir AND removes the superseded one,
    so staging never accumulates an orphaned copy per mtime change."""
    a = _mkcorpus(tmp_path, "a")
    p1 = io.scratch_dir(a, "docs")
    os.makedirs(p1, exist_ok=True)
    # Regenerate: content change moves the fingerprint -> new digest.
    with open(os.path.join(a, "t.parquet"), "wb") as f:
        f.write(b"y" * 32)
    p2 = io.scratch_dir(a, "docs")
    assert p1 != p2
    assert not os.path.exists(p1)  # superseded generation deleted


def test_path_spelling_variants_resolve_to_one_staging(tmp_path):
    """The r7 advisor follow-up: src_tag hashed the caller's raw path
    spelling, so the same corpus reached via a relative path, doubled
    slash, or symlink produced a different label — superseded
    generations under the other spelling silently stopped being
    evicted. scratch_dir must canonicalize (realpath) before hashing:
    every spelling of one corpus maps to ONE staging dir."""
    a = _mkcorpus(tmp_path, "a")
    canonical = io.scratch_dir(a, "docs")
    assert io.scratch_dir(a + "/", "docs") == canonical
    doubled = a.replace("/sf0.01", "//sf0.01")
    assert io.scratch_dir(doubled, "docs") == canonical
    rel = os.path.relpath(a)
    assert io.scratch_dir(rel, "docs") == canonical
    link = str(tmp_path / "lnk")
    os.symlink(a, link)
    assert io.scratch_dir(link, "docs") == canonical
    # And eviction still works across spellings: regenerate via the
    # symlink, compute via the original spelling — the superseded
    # generation must be deleted, not orphaned.
    os.makedirs(canonical, exist_ok=True)
    with open(os.path.join(a, "t.parquet"), "wb") as f:
        f.write(b"z" * 48)
    p2 = io.scratch_dir(link, "docs")
    assert p2 != canonical
    assert not os.path.exists(canonical)


def test_orphaned_staging_is_garbage_collected(tmp_path, monkeypatch):
    """Prefix eviction only covers re-keyed generations of a LIVE
    corpus; staging whose source is simply gone (a pytest tmp_path
    corpus after its session) previously accumulated forever. Each
    scratch_dir call records the canonical source in a .src sidecar
    (outside the dir — inside it would not survive the overwrite
    restage), and the first call of a process sweeps siblings whose
    recorded source no longer exists."""
    import shutil

    a = _mkcorpus(tmp_path, "gone")
    b = _mkcorpus(tmp_path, "alive")
    pa = io.scratch_dir(a, "docs")
    pb = io.scratch_dir(b, "docs")
    os.makedirs(pa, exist_ok=True)
    os.makedirs(pb, exist_ok=True)
    assert os.path.exists(pa + ".src") and os.path.exists(pb + ".src")
    shutil.rmtree(str(tmp_path / "gone"))
    monkeypatch.setattr(io, "_GC_DONE", False)
    pb2 = io.scratch_dir(b, "docs")
    assert pb2 == pb and os.path.exists(pb)  # live corpus untouched
    assert not os.path.exists(pa)  # orphan swept
    assert not os.path.exists(pa + ".src")  # sidecar swept with it


def test_sidecar_survives_repeat_calls_and_eviction(tmp_path):
    """The eviction loop deletes by label prefix; the CURRENT dir's
    .src sidecar shares that prefix and must be excluded, and a
    superseded generation's sidecar must go with its dir."""
    a = _mkcorpus(tmp_path, "a")
    p1 = io.scratch_dir(a, "docs")
    assert os.path.exists(p1 + ".src")
    assert io.scratch_dir(a, "docs") == p1
    assert os.path.exists(p1 + ".src")  # not churned by the re-call
    with open(os.path.join(a, "t.parquet"), "wb") as f:
        f.write(b"q" * 64)  # regenerate -> new digest
    p2 = io.scratch_dir(a, "docs")
    assert p2 != p1
    assert not os.path.exists(p1 + ".src")  # old sidecar evicted too
    assert os.path.exists(p2 + ".src")
