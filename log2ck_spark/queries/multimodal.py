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
    for an image/audio blob column at identical schema/partitioning.

    NULL payloads are dropped HERE, at the source: a null blob has no
    decodable content (schema-level reject, the multimodal analog of
    the dead-letter split), and letting it reach the codecs would
    crash every Arrow batch it rides in. Mirrored as
    `WHERE text IS NOT NULL` in the oracles."""
    return (
        tbl(spark, sf_dir, "documents", fanout=True)
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
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


def _pil():
    """Feature-detect Pillow (r10): returns the PIL.Image module when
    installed, else None. Import is deferred to call time — executors
    re-import this module, and a driver-side probe would pin the
    DRIVER's environment onto workers that may differ."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """Decode step. With Pillow installed (feature-detected at call
    time) the real codec path decodes each payload and emits true
    (width, height, n_pixels, mean pixel byte); `fake=True` derives
    deterministic pseudo stats from the payload bytes so the full
    pipeline (schema, batching, downstream aggs) is exercised
    end-to-end in codec-less containers. Only when real decode is
    requested AND no codec is available does it raise — a
    clearly-marked environment gap, not silent fake data."""
    if not fake:
        img_mod = _pil()
        if img_mod is None:
            raise NotImplementedError(
                "image codecs unavailable in this environment (pip "
                "install Pillow), and fake=True was not requested; "
                "run with fake=True for the deterministic stand-in"
            )
        import io as _io

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                with img_mod.open(_io.BytesIO(b)) as im:
                    gray = im.convert("L")
                    width, height = gray.size
                    data = gray.tobytes()
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": width,
                        "height": height,
                        "n_pixels": width * height,
                        "mean_byte": (sum(data) / len(data)) if data else 0.0,
                    }
                )
            yield pd.DataFrame(rows)
        return
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
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS kind
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata extraction via mapInPandas — oracle-checkable
    because md5/byte-length are engine-portable (strlen counts OCTETS
    like the payload's len(); LENGTH counts codepoints and diverges on
    multibyte text — found by the r9 --unicode hostile gate)."""
    return binary_docs(spark, sf_dir).mapInPandas(extract_meta, schema=META_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_digest string"
RESIZE_SCHEMA = "doc_id bigint, orig_bytes int, thumb_bytes int, thumb_digest string"

_FRAME_BYTES = 32  # fake codec: one "frame" per 32 payload bytes
_FRAME_STRIDE = 4  # uniform sampling: keep every 4th frame
_RESIZE_FACTOR = 4  # fake resize: keep every 4th byte


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame-sampling plumbing: one input payload fans out to
    ceil(frames/stride) frame rows. A real implementation would call
    ffmpeg per payload here; the deterministic stand-in derives each
    frame's digest from (payload, frame_idx) so the full fan-out is
    byte-for-byte checkable from SQL."""
    for pdf in batches:
        doc_ids: list = []
        idxs: list[int] = []
        digs: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = max(len(b) // _FRAME_BYTES, 1)
            for idx in range(0, n_frames, _FRAME_STRIDE):
                doc_ids.append(doc_id)
                idxs.append(idx)
                digs.append(hashlib.md5(b + b":%d" % idx).hexdigest())
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_digest": digs}
        )


def resize_thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize/thumbnail plumbing: payload shrinks by _RESIZE_FACTOR
    (fake resize = every 4th byte; a real one decodes + bilinear-
    downsamples). Emits old/new sizes + digest of the resized bytes."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            thumb = b[::_RESIZE_FACTOR]
            rows.append(
                {
                    "doc_id": doc_id,
                    "orig_bytes": len(b),
                    "thumb_bytes": len(thumb),
                    # digest of the LOWERCASE HEX of the thumb bytes:
                    # decimated octets can be invalid UTF-8, and the
                    # DuckDB oracle's md5 only accepts VARCHAR
                    "thumb_digest": hashlib.md5(
                        thumb.hex().encode()
                    ).hexdigest(),
                }
            )
        yield pd.DataFrame(rows)


FEATURE_SCHEMA = "doc_id bigint, pos int, feat double"
_N_FEATURES = 8


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature-extraction plumbing: payload -> small float vector
    (a real pipeline would run an image/audio encoder here). The
    deterministic stand-in maps the payload digest's first bytes to
    [0, 1] floats; emitted LONG-FORM (doc_id, pos, feat) so the exact
    values are hash-comparable cross-engine without array columns."""
    for pdf in batches:
        doc_ids: list = []
        poss: list[int] = []
        feats: list[float] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            digest = hashlib.md5(bytes(payload)).digest()
            for i in range(_N_FEATURES):
                doc_ids.append(doc_id)
                poss.append(i + 1)
                feats.append(round(digest[i] / 255.0, 6))
        yield pd.DataFrame({"doc_id": doc_ids, "pos": poss, "feat": feats})


@register(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           ROUND(CAST(('0x' || substr(md5(text), 2 * i - 1, 2)) AS INTEGER)
                 / 255.0, 6) AS feat
    FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents, LATERAL (
      SELECT unnest(range(1, {_N_FEATURES + 1})) AS i
    )
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> feature vector via mapInPandas (the encoder
    slot of an embedding pipeline; deterministic fake encoder keeps it
    fully value-checked — each md5 byte i is hex pair 2i-1..2i, which
    DuckDB reproduces)."""
    return binary_docs(spark, sf_dir).mapInPandas(
        extract_features, schema=FEATURE_SCHEMA
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(idx AS INTEGER) AS frame_idx,
           md5(text || ':' || idx) AS frame_digest
    FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents, LATERAL (
      SELECT unnest(range(0,
                          greatest(strlen(text) // {_FRAME_BYTES}, 1),
                          {_FRAME_STRIDE})) AS idx
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas — the
    one-row-in / many-rows-out Arrow batch shape a video pipeline
    needs (schema declared, fan-out inside the batch, no driver
    involvement). Deterministic fake codec ⇒ fully oracle-checked."""
    return binary_docs(spark, sf_dir).mapInPandas(
        sample_frames, schema=FRAME_SCHEMA
    )


@register(
    "multimodal_resize_fake",
    oracle=f"""
    WITH t AS (
      -- byte-level decimation without BLOB slicing (this DuckDB has
      -- none): hex the WHOLE payload, then take byte i's hex pair at
      -- string positions 2i+1..2i+2
      SELECT doc_id, strlen(text) AS nb, lower(hex(encode(text))) AS hx
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(nb AS INTEGER) AS orig_bytes,
           CAST((nb + {_RESIZE_FACTOR - 1}) // {_RESIZE_FACTOR}
                AS INTEGER) AS thumb_bytes,
           md5(COALESCE(array_to_string(
             [substr(hx, 2 * i + 1, 2)
              for i in range(0, nb, {_RESIZE_FACTOR})], ''), ''))
             AS thumb_digest
    FROM t
    """,
)
def multimodal_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step plumbing (1:1 row mapping, payload-shrinking) via
    mapInPandas; deterministic byte-decimation stand-in for the codec,
    digests oracle-checked. Decimation operates on OCTETS (the honest
    binary-payload semantic), so on multibyte text the thumb is not
    valid UTF-8 — the digest is therefore defined over the thumb's
    LOWERCASE HEX (DuckDB's md5 is VARCHAR-only), a total fingerprint
    both engines can compute on any byte string."""
    return binary_docs(spark, sf_dir).mapInPandas(
        resize_thumb, schema=RESIZE_SCHEMA
    )


@register(
    "multimodal_decode_fake",
    oracle="""
    WITH d AS (
      SELECT 16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 16
               AS width,
             16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 16
               AS height
      FROM documents WHERE text IS NOT NULL
    )
    SELECT width, height,
           COUNT(*) AS n_docs,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels
    FROM d GROUP BY width, height
    """,
)
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode pipeline with the deterministic fake codec, then a
    typed aggregate over the decoded stats. The fake dims derive from
    the payload's md5 bytes (digest[0]/digest[1] = first two hex byte
    pairs), which DuckDB reproduces — so even the STUBBED decode path
    is value-checked end-to-end, not rows-only."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return decode_image(batches, fake=True)

    decoded = binary_docs(spark, sf_dir).mapInPandas(_decode, schema=DECODE_SCHEMA)
    return decoded.groupBy("width", "height").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pixels").alias("total_pixels"),
    )


@register(
    "multimodal_dedup",
    oracle="""
    SELECT md5(text) AS digest,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id,
           CAST(MIN(strlen(text)) AS BIGINT)
             * (COUNT(*) - 1) AS bytes_saved
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact payload dedup over the binary column — the first pass of
    every image/audio training-data pipeline (identical files arrive
    via thousands of URLs; content-digest dedup removes them before
    any decode cost). The digest is computed JVM-SIDE (`F.md5` over
    the binary payload, codegen'd in the scan) — payload bytes never
    cross into Python, unlike the Arrow-batched decode steps; only
    16-byte digests shuffle. Canonical survivor = min doc_id;
    bytes_saved audits the win.

    At 100 TB of media this is THE highest-leverage dedup: one scan,
    one digest-width shuffle, and every downstream decode runs
    per-unique-payload instead of per-copy."""
    return (
        binary_docs(spark, sf_dir)
        .groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            (
                F.min(F.length("payload")).cast("bigint")
                * (F.count("*") - 1)
            ).alias("bytes_saved"),
        )
    )


@register(
    "ingest_binaryfile",
    oracle="""
    SELECT md5(text) AS digest,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    WHERE text IS NOT NULL AND doc_id % 50 = 0
    """,
)
def ingest_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real multimodal ingestion path: opaque media FILES on
    storage read through Spark's native `binaryFile` source (one row
    per file: path, modificationTime, length, content) — how
    image/audio corpora actually enter a pipeline, vs the in-table
    binary column the other multimodal queries start from. A sample
    of payloads is materialized as real files, read back via
    binaryFile, and digest-verified against an independent oracle
    derivation — proving the file round-trip is byte-exact.

    Scale notes: binaryFile parallelizes per file and never splits
    one (a media file is undecodable in halves); pair with
    maxPartitionBytes-sized batching so one task holds a bounded
    payload set. The 1-in-50 sample staging is FIXTURE SCAFFOLDING (a
    deployment's media files already exist on storage), and the file
    writes run EXECUTOR-SIDE via foreachPartition — each task writes
    only its own partition's payloads, so no corpus-proportional state
    ever reaches the driver (on a cluster this targets the shared
    object store the binaryFile scan reads back, the normal media
    layout). The measured query path — the binaryFile scan and
    digesting — is fully distributed and sample-size-independent."""
    import os
    import shutil

    from log2ck_spark.io import ensure_staged, scratch_dir

    def _stage(path: str) -> None:
        sample = binary_docs(spark, sf_dir).filter(F.col("doc_id") % 50 == 0)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)

        # one file per payload, named by doc_id (binaryFile's unit IS
        # the file); tmp-then-rename so a rerun over a half-written dir
        # never exposes a torn file to the scan below
        def _write_files(rows):
            import os as _os

            # executors create the dir themselves: the driver's
            # makedirs above only exists on the driver's filesystem.
            # NOTE this staging requires `path` to resolve to SHARED
            # storage on a real cluster (object store / NFS) — with
            # executor-local disks the scan below would silently see
            # zero files; in this sandbox (local mode) driver and
            # executors share the repo FS.
            _os.makedirs(path, exist_ok=True)
            for row in rows:
                tmp = _os.path.join(path, f".{row.doc_id}.tmp")
                with open(tmp, "wb") as f:
                    f.write(bytes(row.payload))
                _os.replace(tmp, _os.path.join(path, f"{row.doc_id}.bin"))

        sample.select("doc_id", "payload").repartition(8).foreachPartition(
            _write_files
        )
        # commit marker LAST (ensure_staged contract): created only
        # after every partition's writes have returned, and the rmtree
        # above removes it first on a restage, so a crash mid-stage
        # can never leave a marker over a torn directory.
        with open(os.path.join(path, "_SUCCESS"), "w"):
            pass

    path = ensure_staged(scratch_dir(sf_dir, "binary_payloads"), _stage)
    # pathGlobFilter (not a path glob): skips any .tmp leftover from a
    # failed task retry AND, unlike `load(path + "/*.bin")`, returns an
    # empty frame instead of PATH_NOT_FOUND when the sample is empty
    # (degenerate fixtures).
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return files.select(
        F.md5("content").alias("digest"),
        F.col("length").cast("bigint").alias("n_bytes"),
    )
