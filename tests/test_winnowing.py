"""Winnowing fingerprint semantics, checked against an independent
pure-Python reimplementation (the md5-derived k-gram hash is portable,
so exact sets are reproducible outside Spark)."""

from __future__ import annotations

import hashlib

from log2ck_spark.queries import QUERIES, load_all

load_all()

K, W = 5, 4
SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def py_winnow(text: str) -> tuple[list[int], str]:
    toks = text.split(" ")
    kh = [
        int(hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - K + 1)
    ]
    win = (
        sorted({min(kh[i : i + W]) for i in range(len(kh) - W + 1)})
        if len(kh) >= W
        else []
    )
    digest = hashlib.md5(",".join(map(str, win)).encode()).hexdigest()
    return win, digest


def _mini_documents(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (0, SPAN, "en", "s", 1),
            (1, "unrelated prefix words here " + SPAN, "en", "s", 1),
            (2, "totally different content with no overlap at all", "en", "s", 1),
            (3, "tiny", "en", "s", 1),  # shorter than the k-gram width
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_winnow_matches_independent_implementation(spark, tmp_path):
    sf_dir = _mini_documents(spark, tmp_path)
    rows = {
        r.doc_id: r
        for r in QUERIES["text_winnow_fingerprint"](spark, sf_dir).collect()
    }
    texts = {
        0: SPAN,
        1: "unrelated prefix words here " + SPAN,
        2: "totally different content with no overlap at all",
        3: "tiny",
    }
    for doc_id, text in texts.items():
        win, digest = py_winnow(text)
        assert rows[doc_id].n_fingerprints == len(win), doc_id
        assert rows[doc_id].fp_digest == digest, doc_id


def test_shared_span_shares_fingerprints(spark, tmp_path):
    """Position-robustness: a doc embedding another doc's span at a
    different offset keeps every one of its windows' fingerprints."""
    sf_dir = _mini_documents(spark, tmp_path)
    assert QUERIES["text_winnow_fingerprint"](spark, sf_dir).count() == 4
    w0, _ = py_winnow(SPAN)
    w1, _ = py_winnow("unrelated prefix words here " + SPAN)
    w2, _ = py_winnow("totally different content with no overlap at all")
    assert set(w0) <= set(w1)  # containment detected
    assert not (set(w0) & set(w2))  # disjoint content -> no overlap
