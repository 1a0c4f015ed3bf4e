"""Semantic invariants for the batch-assembly operators beyond the
oracle hash check: chunk reconstruction, packing placement laws, and
sampling rate bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from log2ck_spark.io import tbl
from log2ck_spark.queries import QUERIES, load_all
from log2ck_spark.queries.packing import (
    _CHUNK_STRIDE,
    _CHUNK_W,
    _PACK_BUDGET,
    _STRATA_CAP,
)

load_all()


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Dropping each chunk's overlap prefix (except chunk 0) and
    concatenating in chunk order must reproduce the original text —
    the lossless-coverage property a training chunker needs."""
    chunks = QUERIES["chunk_documents"](spark, sf_dir)
    overlap = _CHUNK_W - _CHUNK_STRIDE
    tail = F.array_join(
        F.slice(
            F.split("chunk_text", " "),
            overlap + 1,
            F.size(F.split("chunk_text", " ")),
        ),
        " ",
    )
    rebuilt = (
        chunks.withColumn(
            "part", F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(tail)
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "part"))
                ).getField("part"),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    mismatch = (
        rebuilt.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_pack_placement_laws(spark, sf_dir):
    """Offsets stay inside the budget; within a stream, placements are
    dense: every doc starts exactly where the previous one ended
    (concat-and-cut leaves no gaps)."""
    packed = QUERIES["pack_sequences"](spark, sf_dir).collect()
    assert all(0 <= r.bin_offset < _PACK_BUDGET for r in packed)
    streams: dict[int, list] = {}
    for r in packed:
        streams.setdefault(r.pack_group, []).append(r)
    for rows in streams.values():
        rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows:
            assert r.bin_id == pos // _PACK_BUDGET
            assert r.bin_offset == pos % _PACK_BUDGET
            expect_straddle = (pos // _PACK_BUDGET) != (
                (pos + r.n_tok - 1) // _PACK_BUDGET
            )
            assert bool(r.straddles) == expect_straddle
            pos += r.n_tok


def test_stratified_sample_respects_rates(spark, sf_dir):
    """No language exceeds its target by more than binomial noise, and
    languages under the cap are kept whole (rate 1.0)."""
    out = {r.lang: r for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    for lang, r in out.items():
        if r.n_total <= _STRATA_CAP:
            assert r.n_sampled == r.n_total, lang
            assert r.rate == 1.0
        else:
            assert r.n_sampled <= r.n_total
            assert 0.0 < r.rate < 1.0
