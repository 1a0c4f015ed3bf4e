"""Text primitives shared by dedup / text-analysis operators.

All pure column expressions (JVM-side, codegen'd) — tokenization,
w-shingling, fingerprints. No Python in the hot path: at 100 TB these
run inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the documents fixture is space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles(text: Column | str, w: int = 3) -> Column:
    """Distinct word w-shingles via sequence+transform+slice — one
    codegen'd expression, no explode until the caller needs rows.
    Returns array<string>; empty array for texts shorter than w."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set —
    order/multiplicity-insensitive content hash (the exact-dedup key
    that survives token reshuffles). md5 is engine-portable, so the
    DuckDB oracle reproduces it byte-for-byte."""
    canonical = F.array_join(F.array_sort(distinct_tokens(text)), " ")
    return F.md5(canonical)


def minhash_signature(shingle_col: Column, num_perm: int = 128) -> Column:
    """MinHash signature as array<bigint>, length num_perm.

    perm_i(s) = xxhash64(s, i) (seeded 64-bit hash); signature_i =
    min over shingles. Expressed as nested higher-order functions —
    the whole signature is computed inside whole-stage codegen with no
    explode and no shuffle; cost O(num_perm * |shingles|) per doc,
    embarrassingly parallel."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(s, i))
        ),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into `bands` hashed buckets: array of
    (band_index, band_hash) structs. Docs sharing ANY band bucket are
    candidate pairs — the standard MinHash-LSH banding scheme."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket"),
        ),
    )


def simhash_bit_votes(hash_col: Column) -> list[Column]:
    """The 64 per-bit SimHash vote terms for one token hash: +1 if bit
    b is set, -1 otherwise. Summed per document by the caller (a single
    hash-aggregate pass — see queries.dedup.dedup_simhash)."""
    return [
        (F.shiftright(hash_col, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{b}")
        for b in range(64)
    ]


def simhash_from_votes(vote_cols: list[Column]) -> Column:
    """Assemble the 64-bit simhash from summed votes: bit b = 1 iff
    votes_b > 0. Bit 63 is the sign bit of the bigint."""
    out = F.lit(0).cast("bigint")
    for b, votes in enumerate(vote_cols):
        bit_value = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("bigint")
        out = out + F.when(votes > 0, bit_value).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes: popcount(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
