"""Multimodal column plumbing (SURVEY.md Part C / north-star).

Images/audio/video are opaque `binary` payloads + typed metadata. The
Spark-side machinery — binary schema, Arrow batch shape, mapInPandas
signatures, partition-sized batching — is real and oracle-checked
(`multimodal_meta`: metadata extraction whose md5/length output DuckDB
reproduces). The actual codec step is stubbed (decode libs aren't in
this container): `decode_image` raises NotImplementedError unless
`fake=True`, whose deterministic stand-in keeps the dataflow testable
(`multimodal_decode_fake`, rows-only).

Scale: payloads stay in executor-side Arrow batches; nothing ever
collects to the driver. For real media, pair with
`spark.sql.files.maxPartitionBytes` tuning so one task holds a bounded
number of payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.io import tbl
from log2ck_spark.queries import register

META_SCHEMA = "doc_id bigint, n_bytes int, digest string, kind string"
DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels int, mean_byte double"
)


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload column — the stand-in
    for an image/audio blob column at identical schema/partitioning."""
    return tbl(spark, sf_dir, "documents", fanout=True).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


def extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Typed-metadata extraction over binary payloads, Arrow-batched."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "kind": "text/plain",
            }
        )


def decode_image(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """Decode step. Real codecs (PIL/ffmpeg) are NOT in this container
    — clearly-marked stub; `fake=True` derives deterministic pseudo
    image stats from the payload bytes so the full pipeline (schema,
    batching, downstream aggs) is exercised end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image/audio codecs unavailable in this environment; "
            "run with fake=True for the deterministic stand-in"
        )
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            digest = hashlib.md5(b).digest()
            width = 16 + digest[0] % 16
            height = 16 + digest[1] % 16
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": width,
                    "height": height,
                    "n_pixels": width * height,
                    "mean_byte": (sum(b) / len(b)) if b else 0.0,
                }
            )
        yield pd.DataFrame(rows)


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS kind
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata extraction via mapInPandas — oracle-checkable
    because md5/byte-length are engine-portable (fixture text is
    ASCII ⇒ LENGTH == octet length)."""
    return binary_docs(spark, sf_dir).mapInPandas(extract_meta, schema=META_SCHEMA)


@register("multimodal_decode_fake")
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode pipeline with the deterministic fake codec, then a
    typed aggregate over the decoded stats (rows-only check: the fake
    codec's md5-derived dims aren't SQL-expressible)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return decode_image(batches, fake=True)

    decoded = binary_docs(spark, sf_dir).mapInPandas(_decode, schema=DECODE_SCHEMA)
    return decoded.groupBy("width", "height").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pixels").alias("total_pixels"),
    )
