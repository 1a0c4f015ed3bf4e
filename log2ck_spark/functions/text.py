"""Text primitives shared by dedup / text-analysis operators.

All pure column expressions (JVM-side, codegen'd) — tokenization,
w-shingling, fingerprints. No Python in the hot path: at 100 TB these
run inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bound(value: Column, fn) -> Column:
    """A per-row let-binding: evaluate `value` exactly once and feed
    the MATERIALIZED result to `fn`, via
    ``transform(array(value), v -> fn(v))[0]``.

    Why it exists: Catalyst's CollapseProject freely inlines a
    projected column into its consumers, so "bind it in a separate
    select" does not survive optimization. When the consumer
    references the column O(n) times inside a lambda (sliding windows
    over an array), the inlined expression re-evaluates at every
    reference — quadratic per row (measured 90 s → 6 s on the winnow
    containment join at sf0.1). A higher-order-function lambda
    variable, by contrast, is bound to a materialized value."""
    return F.get(F.transform(F.array(value), fn), 0)


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the documents fixture is space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles(text: Column | str, w: int = 3) -> Column:
    """Distinct word w-shingles via sequence+transform+slice — one
    codegen'd expression, no explode until the caller needs rows.
    Returns array<string>; empty array for texts shorter than w.
    The token array is let-bound (`bound`) so each window slices a
    materialized array — without it the per-position lambda re-runs
    the split(), quadratic per row."""

    def _sh(toks: Column) -> Column:
        n = F.size(toks)
        # Guard short docs explicitly: sequence(1, 0) is DESCENDING in
        # Spark ([1, 0]), so the old greatest(n-w+1, 0) bound fed
        # slice() a 0 start index and threw on any doc shorter than w
        # tokens.
        idx = F.sequence(F.lit(1), n - F.lit(w - 1))
        return F.when(
            n >= F.lit(w),
            F.array_distinct(
                F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bound(tokens(text), _sh)


def hashed_shingles(toks_col: Column | str, w: int = 5) -> Column:
    """Distinct word w-shingles (over a bound token-array column)
    hashed straight to 64-bit ints —
    `xxhash64(tok_i, ..., tok_{i+w-1})` per window position, no string
    concatenation ever materialized. Returns array<bigint>.

    This is the representation every similarity operator downstream
    should consume: set semantics are preserved w.h.p. (64-bit
    collisions over even 10^8 distinct shingles: p ≈ 2.7e-4 for ONE
    collision anywhere, and a single collision perturbs one Jaccard by
    ~1/|set|), while shuffles, aggregates, and array_intersect all run
    over fixed-width longs instead of ~40-byte strings.

    The token array is let-bound internally (`bound`), so callers may
    pass either a column name or an inline expression — the shingle
    lambda references the array w times per position, and an UNBOUND
    reference re-evaluates at every use (a separate select does not
    help: CollapseProject inlines it; measured 5× slower)."""
    toks_in = F.col(toks_col) if isinstance(toks_col, str) else toks_col

    def _sh(toks: Column) -> Column:
        n = F.size(toks)
        # Same short-doc guard as `shingles`: without it, sequence(1, 0)
        # yields [1, 0] and element_at(toks, 0) (plus past-the-end reads
        # under ANSI mode) aborts the whole job on one sub-w-token doc.
        idx = F.sequence(F.lit(1), n - F.lit(w - 1))
        return F.when(
            n >= F.lit(w),
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.xxhash64(
                        *[F.element_at(toks, i + j) for j in range(w)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    return bound(toks_in, _sh)


def hashed_shingles_positional(toks_col: Column | str, w: int = 5) -> Column:
    """Like `hashed_shingles` but WITHOUT the distinct-set collapse:
    one hashed w-gram per window position, order preserved — for
    consumers that need gram POSITIONS (span merging, winnowing-style
    locality), where collapsing repeats would lose offsets. Returns
    array<bigint> of length max(n - w + 1, 0)."""
    toks_in = F.col(toks_col) if isinstance(toks_col, str) else toks_col

    def _sh(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(1), n - F.lit(w - 1))
        return F.when(
            n >= F.lit(w),
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.element_at(toks, i + j) for j in range(w)]
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    return bound(toks_in, _sh)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set —
    order/multiplicity-insensitive content hash (the exact-dedup key
    that survives token reshuffles). md5 is engine-portable, so the
    DuckDB oracle reproduces it byte-for-byte."""
    canonical = F.array_join(F.array_sort(distinct_tokens(text)), " ")
    return F.md5(canonical)


def minhash_min_aggs(shingle_row_col: str, num_perm: int = 128) -> list[Column]:
    """MinHash as aggregate expressions over EXPLODED (doc, shingle)
    rows: perm_i(h) = xxhash64(h, i) (seed folded into the hash input),
    signature_i = MIN over the doc's shingles.

    Pass a PRE-HASHED bigint shingle column (see `hashed_shingles`):
    each permutation then re-hashes a fixed 8-byte value instead of the
    full shingle string — the num_perm× inner loop touches 16 bytes,
    not ~40, per shingle (measured ~1.6× on the signature stage).

    Why this shape: a nested higher-order-function formulation
    (transform-inside-transform) falls out of whole-stage codegen and
    runs interpreted (~50x slower, measured). Exploding once and
    computing `num_perm` MIN aggregates keeps everything in the
    vectorized codegen'd hash aggregate; the shuffle carries one
    num_perm-wide row per doc. At 10^10 docs this is a single
    map-side-combined aggregation — the canonical MinHash plan.

    r13: each aggregate is one F.expr() SQL parse instead of four
    chained Column calls — per-Column-operation py4j round-trips were
    the dominant cost of BUILDING this 128-wide plan on the driver
    (guide §4's JVM↔Python boundary, at plan-construction time:
    measured 1.7 s build for dedup_minhash_lsh, vs 0.04 s of actual
    Catalyst optimization). The parsed expression tree is identical."""
    return [
        F.expr(f"min(xxhash64({shingle_row_col}, {i})) AS m{i}")
        for i in range(num_perm)
    ]


def lsh_band_array(num_perm: int = 128, bands: int = 32) -> Column:
    """array<struct<band,bucket>> of LSH band buckets from the
    m0..m{num_perm-1} signature columns: bucket_b =
    xxhash64(m_{b*r}..m_{b*r+r-1}, b). Multi-arg xxhash64 avoids
    string materialization entirely. One F.expr parse for the whole
    array (r13 — the per-struct Column-API loop was ~300 py4j
    round-trips of pure driver overhead per plan build)."""
    r = num_perm // bands
    structs = ", ".join(
        "struct({b} AS band, xxhash64({ms}, {b}) AS bucket)".format(
            b=b, ms=", ".join(f"m{b * r + j}" for j in range(r))
        )
        for b in range(bands)
    )
    return F.expr(f"array({structs})")


def simhash_vote_aggs(hash_name: str, bits: int = 64) -> list[Column]:
    """The per-bit SimHash vote SUM aggregates over exploded
    (doc, token-hash) rows: +1 if bit b of the hash is set, -1
    otherwise, summed per document in a single hash-aggregate pass
    (see queries.dedup.dedup_simhash). One F.expr parse per aggregate
    (r13 — same plan-build py4j economics as minhash_min_aggs)."""
    return [
        F.expr(f"sum((shiftright({hash_name}, {b}) & 1) * 2 - 1) AS v{b}")
        for b in range(bits)
    ]


def simhash_from_votes(vote_prefix: str = "v", bits: int = 64) -> Column:
    """Assemble the 64-bit simhash from the summed vote columns
    {prefix}0..{prefix}63: bit b = 1 iff votes_b > 0. Bit 63 is the
    sign bit of the bigint. Single F.expr parse (r13): the Column-API
    loop built a 64-term CASE chain at ~6 py4j calls per term."""
    terms = " + ".join(
        "(CASE WHEN {p}{b} > 0 THEN {v} ELSE 0L END)".format(
            p=vote_prefix,
            b=b,
            v=(
                "CAST(-9223372036854775808 AS BIGINT)"
                if b == 63
                else f"{1 << b}L"
            ),
        )
        for b in range(bits)
    )
    return F.expr(terms)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes: popcount(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
