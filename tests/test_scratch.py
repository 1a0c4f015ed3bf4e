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
