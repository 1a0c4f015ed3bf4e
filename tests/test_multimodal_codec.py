"""decode_image's real-codec path (r10): feature-detected Pillow.

The container this repo is developed in has no image codecs, so the
registered queries exercise the deterministic fake path — but the
REAL path must exist and work wherever Pillow is installed. The PNG
test runs a genuine decode through the same mapInPandas plumbing the
fake path uses (skipped when Pillow is absent); the contract tests run
everywhere.
"""

from __future__ import annotations

import pandas as pd
import pytest

from log2ck_spark.queries.multimodal import _pil, decode_image

_HAS_PIL = _pil() is not None

# A valid 1×1 gray PNG (pixel value 128), generated with the stdlib
# (zlib + hand-built chunks, CRCs verified) and inlined so the fixture
# needs no codec to EXIST — only to decode.
_PNG_1x1_GRAY128 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108000000003a7e9b55"
    "0000000a49444154789c636800000082008177cd72b60000000049454e44ae42"
    "6082"
)


def test_real_decode_without_codec_raises_clearly():
    """When Pillow is absent and fake was NOT requested, the decode
    must fail loudly with the install hint — never fall back to fake
    data silently."""
    if _HAS_PIL:
        pytest.skip("Pillow installed — the no-codec branch is dead here")
    batch = pd.DataFrame({"doc_id": [1], "payload": [b"xx"]})
    with pytest.raises(NotImplementedError, match="Pillow"):
        list(decode_image(iter([batch])))


def test_fake_path_never_needs_a_codec():
    batch = pd.DataFrame({"doc_id": [7], "payload": [b"abcdef"]})
    (out,) = list(decode_image(iter([batch]), fake=True))
    assert list(out.columns) == [
        "doc_id", "width", "height", "n_pixels", "mean_byte",
    ]
    assert out["n_pixels"][0] == out["width"][0] * out["height"][0]


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_png_decodes_through_mapinpandas(spark):
    """A genuine 1×1 PNG through the SAME Arrow mapInPandas plumbing
    the registered queries use — proves the real-codec path end to
    end wherever Pillow exists."""
    from log2ck_spark.queries.multimodal import DECODE_SCHEMA

    df = spark.createDataFrame(
        [(1, bytearray(_PNG_1x1_GRAY128))], "doc_id bigint, payload binary"
    )
    (row,) = df.mapInPandas(decode_image, schema=DECODE_SCHEMA).collect()
    assert (row["width"], row["height"], row["n_pixels"]) == (1, 1, 1)
    assert row["mean_byte"] == 128.0


def test_inlined_png_fixture_is_structurally_valid():
    """Stdlib-only validation (runs even where Pillow is absent): the
    inlined PNG's chunk CRCs check out and the IDAT inflates to one
    filter byte + one 0x80 pixel — so the skipif test above cannot be
    skipped forever against a rotten fixture."""
    import binascii
    import struct
    import zlib

    b = _PNG_1x1_GRAY128
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    i, seen = 8, []
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        typ, data = b[i + 4 : i + 8], b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", b[i + 8 + ln : i + 12 + ln])
        assert binascii.crc32(typ + data) & 0xFFFFFFFF == crc, typ
        if typ == b"IHDR":
            assert struct.unpack(">IIBB", data[:10]) == (1, 1, 8, 0)
        if typ == b"IDAT":
            assert zlib.decompress(data) == b"\x00\x80"
        seen.append(typ)
        i += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]
