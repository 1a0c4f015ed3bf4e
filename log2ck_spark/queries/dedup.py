"""Deduplication operators (SURVEY.md §2 Part C1/C2) over `documents`.

Five variants, cheapest-to-richest:
* exact text dedup (hash groupBy),
* canonical fingerprint dedup (sorted-token md5),
* exact n-gram Jaccard similarity join via an inverted shingle index
  (the oracle-checkable ground truth),
* MinHash + LSH banding (the 100 TB path: candidates via band buckets,
  exact Jaccard verification only on candidates),
* SimHash near-dup (Hamming ≤ k via chunk banding),
* embedding-cosine near-dup.

Scale design: nothing here is O(n²) except the verification of LSH
*candidates* (expected ~#true-pairs). The inverted-index joins shuffle
on (shingle/band/chunk) keys; stop-shingle skew is handled by dropping
ubiquitous shingles (df > threshold) — the classic stop-word cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.text import (
    fingerprint,
    hamming64,
    hashed_shingles,
    lsh_band_array,
    minhash_min_aggs,
    simhash_from_votes,
    simhash_vote_aggs,
    tokens,
)
from log2ck_spark.functions.vectors import (
    ORACLE_FINITE_VEC,
    as_double,
    cosine,
    finite_vec,
)
from log2ck_spark.functions.plan import filter_compute_once
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

JACCARD_THRESHOLD = 0.7  # fixture near-dups cluster at >=0.9; noise <0.3

# Hard bound on per-bucket pair expansion (r10). A duplicate class of
# d docs shares ALL LSH bands / simhash chunks, so one bucket holds all
# d ids and the naive i<j expansion emits d(d-1)/2 structs in ONE task
# — a 1M-copy boilerplate page (routine in a web crawl) is a 5×10¹¹-
# pair array materialized before the explode, i.e. an executor OOM.
# The cap bounds the expansion to CAP(CAP-1)/2 all-pairs among the CAP
# smallest doc_ids PLUS a connectivity-preserving "star": every doc
# beyond the cap is still paired with the bucket's minimum id, so no
# document silently vanishes from candidate generation (no silent
# caps) and exact-duplicate classes still dedup COMPLETELY — every
# (min, x) pair verifies at jaccard 1.0 and transitive clustering
# (dedup_clusters) reconnects the class through the shared min. What
# the cap gives up, documented: in a bucket of d > CAP, tail×tail
# pairs that are similar to each other but NOT to the bucket min are
# not emitted from THIS bucket (they usually surface from another of
# the 32 bands). Fixture buckets never approach the cap, so oracle
# results are bit-identical; tests/test_dedup_scale.py proves the
# bound and the connectivity guarantee on a synthetic dup-class bomb.
BUCKET_CAP = 1024

# Hard bound on per-DOCUMENT shingle-set size (r10, the --jumbo
# gate's scale follow-through). MinHash cost is |shingles| × 128
# hashes in the ONE task holding the row, and the row itself carries
# 8·|shingles| bytes through every downstream join: a 1 GB crawl
# outlier (~10⁸ tokens) is a ~10¹⁰-hash straggler task and an ~800 MB
# shuffle row — the per-document twin of the per-bucket bomb above.
# The cap keeps the FIRST 2¹⁸ distinct shingles in document order
# (array_distinct preserves first occurrence, so the slice is a
# deterministic prefix-of-document cap — no sampling, no seed).
# Same contract as BUCKET_CAP: at or under the cap the shingle set is
# EXACTLY unchanged (the --jumbo outlier tops out at 20k shingles,
# ~7% of the cap, so every oracle row is bit-identical), and the
# documented production posture is that docs past ~250k distinct
# shingles should be length-filtered upstream (text_gopher_rules /
# curate_pipeline) before entering near-dup — the cap is the
# engine-side guarantee that one pathological page cannot straggle
# the stage either way. tests/test_dedup_scale.py pins both halves.
SHINGLE_CAP = 1 << 18

_ORACLE_SHINGLE_PAIRS = """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, greatest(len(toks) - 4, 0) + 1)]) AS s
      FROM tok
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
"""


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct 5-shingle set as array<bigint> (64-bit hashed;
    see functions.text.hashed_shingles). Every downstream set operation
    — posting-list explode, MinHash, df-ranking, array_intersect
    verification — runs over fixed-width longs; Jaccard values are
    identical to string shingles w.h.p., which is what the DuckDB
    string-shingle oracle checks. Tokens are bound as a column before
    shingling (see hashed_shingles docstring re codegen recompute)."""
    return (
        tbl(spark, sf_dir, "documents", fanout=True)
        .select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            # SHINGLE_CAP: deterministic prefix cap on the distinct-
            # shingle set (see the constant's docstring) — a no-op for
            # every doc under 2^18 distinct shingles
            F.slice(
                hashed_shingles("toks", w=5), 1, SHINGLE_CAP
            ).alias("sh"),
        )
    )


def _candidate_pairs(posting: DataFrame, key_cols: list[str]) -> DataFrame:
    """Candidate (doc_a < doc_b) pairs of docs sharing a key — the
    bucket-join primitive behind every similarity candidate generator.

    Instead of a self-join (which computes the whole upstream pipeline
    twice and shuffles it twice), group once per key, collect the
    sorted doc-id set, and emit i<j combinations with a codegen'd
    nested-transform expression. One upstream pass, one shuffle; the
    per-bucket expansion is BUCKET_CAP-bounded (see the constant's
    docstring): all pairs among the CAP smallest ids plus a
    connectivity-preserving star from the bucket min to every id past
    the cap, so no doc drops out of candidate generation."""
    grouped = (
        posting.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        grouped.select(F.explode(capped_pairs_expr("ids")).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def pairs_expr(ids: str) -> Column:
    """All i<j (doc_a, doc_b) structs from a sorted id array — the
    codegen'd nested-transform expansion. Use ONLY where bucket size
    is already bounded upstream (winnow containment's max_df cut);
    unbounded buckets go through `capped_pairs_expr`."""
    return F.flatten(
        F.transform(
            F.col(ids),
            lambda x, i: F.transform(
                F.slice(F.col(ids), i + 2, F.size(F.col(ids))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def capped_pairs_expr(ids: str, cap: int = BUCKET_CAP) -> Column:
    """BUCKET_CAP-bounded pair expansion from a SORTED id array:
    all i<j pairs among the first `cap` ids, plus (ids[0], y) for every
    y past the cap. Expansion is ≤ cap(cap-1)/2 + (d - cap) structs —
    O(d) past the cap instead of O(d²) — and every id appears in at
    least one pair, so a duplicate-class "bomb" bucket stays fully
    connected for transitive dedup while a 1M-id bucket emits ~1.5M
    structs instead of 5×10¹¹. Buckets at or under the cap produce
    EXACTLY the full i<j expansion (fixture-scale output unchanged)."""
    col = F.col(ids)
    head = F.slice(col, 1, cap)
    tail = F.slice(col, cap + 1, F.greatest(F.size(col) - cap, F.lit(0)))
    head_pairs = F.flatten(
        F.transform(
            head,
            lambda x, i: F.transform(
                F.slice(head, i + 2, F.size(head)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    star = F.transform(
        tail,
        lambda y: F.struct(
            F.element_at(col, 1).alias("doc_a"), y.alias("doc_b")
        ),
    )
    return F.concat(head_pairs, star)


def _verify_jaccard(
    candidates: DataFrame, docs: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the full
    shingle arrays (two hash joins sized by |candidates|).

    The threshold filter is guarded with filter_compute_once (r13):
    pushed below the projection, Catalyst re-inlines the jaccard
    expression into the filter and every candidate pays the
    array_intersect twice — the single most expensive per-row op of
    the verify stage (the intersect cost scales with shingle-set
    size, so the factor grows with document length)."""
    sh_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return filter_compute_once(
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter),
        ),
        F.col("jaccard") >= threshold,
    ).select("doc_a", "doc_b", "jaccard")


def _exact_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard similarity join with PPJoin-style prefix
    filtering (Xiao et al., "Efficient Similarity Joins for Near
    Duplicate Detection", WWW'08 — public algorithm).

    A naive inverted-index self-join blows up on ubiquitous shingles:
    a shingle present in d docs contributes d^2 candidate pairs, so
    corpus-frequent shingles dominate the shuffle (measured 9s at sf0.1
    here; at 10^10 docs it's fatal). Prefix filtering keeps the join
    EXACT while only joining on each doc's rarest shingles: order
    shingles by global document frequency; if J(A,B) >= t, the first
    |X| - ceil(t*|X|) + 1 shingles (in that global order) of A and B
    must intersect. Rare shingles have short posting lists, so the
    candidate join is small; candidates are then verified with a full
    array_intersect.

    Input: doc_id, sh (array<string> distinct shingles).
    Output: doc_a, doc_b, jaccard (exact)."""
    # the shingled docs feed three branches (df table, prefix ranking,
    # verification) — persist so the shingling runs once, not 4x. On a
    # cluster this is a MEMORY_AND_DISK cache of one array column.
    docs = docs.persist()
    posting = docs.select("doc_id", F.size("sh").alias("n_sh"),
                          F.explode("sh").alias("shingle"))
    # global shingle document-frequency (one partial-agg pass)
    df_tbl = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    # rank each doc's shingles in the global (df, shingle) order and
    # keep only the prefix. r13 (guide §2.4): hash-aggregate each
    # doc's (df, shingle) structs and take the prefix with a per-row
    # sort_array + slice instead of a Window-partitionBy(doc_id)
    # row_number — the window sorted EVERY posting row by (doc_id, df,
    # shingle) inside its exchange; the agg shuffles the same rows but
    # replaces the partition-wide sort with one in-memory sort per
    # doc's ~90-element array (measured ~1.4 -> ~1.2 s on the full
    # kernel at sf0.1, identical pairs). (df, shingle) is tie-free
    # within a doc (shingles are distinct), so sort_array reproduces
    # the row_number order exactly.
    ranked = posting.join(df_tbl, "shingle")
    prefix_len = (
        F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1
    ).cast("int")
    prefix = (
        ranked.groupBy("doc_id")
        .agg(
            F.first("n_sh").alias("n_sh"),
            F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("ds"),
        )
        .select(
            "doc_id",
            F.explode(F.slice(F.col("ds"), 1, prefix_len)).alias("s"),
        )
        .select("doc_id", F.col("s.shingle").alias("shingle"))
    )
    candidates = _candidate_pairs(prefix, ["shingle"])
    return _verify_jaccard(candidates, docs, threshold)


# --------------------------------------------------------------------------
# C1 exact dedup
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash groupBy on the full text, keeping the lowest
    doc_id (deterministic canonical survivor — dropDuplicates picks an
    arbitrary row, which can't be oracle-checked). Partial aggregation
    dedups map-side before the shuffle."""
    return (
        tbl(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "text", "n_copies")
    )


@register(
    "dedup_fingerprint",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint dedup: md5 of the sorted distinct token set.
    Collapses docs that differ only in word order/repetition. At scale:
    group on a 16-byte key instead of the full text — far smaller
    shuffle than dedup_exact."""
    return (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_docs"))
        .select("fp", "doc_id", "n_docs")
    )


# --------------------------------------------------------------------------
# C2 near-dup: exact n-gram Jaccard (oracle ground truth)
# --------------------------------------------------------------------------


@register("dedup_ngram_jaccard", oracle=_ORACLE_SHINGLE_PAIRS)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-shingle Jaccard pairs >= 0.7 via PPJoin prefix join —
    the ground truth the probabilistic variants are judged against."""
    return _exact_jaccard_pairs(_shingled(spark, sf_dir), JACCARD_THRESHOLD)


# --------------------------------------------------------------------------
# C2 near-dup: MinHash + LSH banding (the scale path)
# --------------------------------------------------------------------------


@register("dedup_minhash_lsh", oracle=_ORACLE_SHINGLE_PAIRS)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + 32 bands x 4 rows, then exact-Jaccard
    verification of candidates only.

    P(candidate | j) = 1-(1-j^4)^32: j=0.9 → miss prob ~1e-15, j=0.3 →
    ~0.23 false-candidate prob, all killed by verification. The only
    shuffles are the band-bucket self-join (keys are 64-bit hashes —
    uniform, no skew) and the candidate verification join; signature
    computation is shuffle-free codegen. This is the shape that
    survives 10^10 documents; its oracle is the exact-Jaccard SQL, so
    the driver check also proves the LSH recall on this corpus."""
    docs = _shingled(spark, sf_dir).filter(F.size("sh") > 0).persist()
    posting = docs.select("doc_id", F.explode("sh").alias("s"))
    sig = posting.groupBy("doc_id").agg(*minhash_min_aggs("s", num_perm=128))
    banded = sig.select(
        "doc_id",
        F.explode(lsh_band_array(num_perm=128, bands=32)).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    candidates = _candidate_pairs(banded, ["band", "bucket"])
    return _verify_jaccard(candidates, docs, JACCARD_THRESHOLD)


# --------------------------------------------------------------------------
# C2 near-dup: SimHash (rows-only — hash-internal, not SQL-expressible)
# --------------------------------------------------------------------------


# SimHash oracle: DuckDB recomputes the ENTIRE pipeline — portable
# 60-bit token hash (first 15 hex chars of md5, parseable by both
# engines), per-bit vote sums, signature assembly, and an all-pairs
# hamming<=3 join (all-pairs is fine at oracle scale; the Spark side
# uses the chunk pigeonhole to avoid it at corpus scale).
_SIMHASH_BITS = 60  # 15 hex chars; bits 60-63 are always 0
_ORACLE_SIMHASH = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
      FROM tok
    ), votes AS (
      SELECT doc_id,
             {", ".join(
                 f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
                 for b in range(_SIMHASH_BITS)
             )}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
             {" + ".join(
                 f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT)"
                 " ELSE CAST(0 AS BIGINT) END)"
                 for b in range(_SIMHASH_BITS)
             )} AS sim
      FROM votes
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
"""


@register("dedup_simhash", oracle=_ORACLE_SIMHASH)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup; pairs within Hamming distance 3 found via the
    4-chunk pigeonhole scheme (hamming<=3 ⇒ at least one identical
    16-bit chunk ⇒ join only on chunk matches — no cross join).

    Signature build: explode tokens → one portable hash per token → one
    hash-aggregate computing all bit-votes per doc in a single pass
    (vectorized partial agg; the shuffle carries 64 ints per doc).

    The token hash is the first 60 bits of md5 rather than xxhash64 so
    DuckDB can replay the whole pipeline as the oracle (xxhash64 isn't
    portable); 60-vs-64 signature bits changes nothing structurally —
    the top chunk just carries 12 effective bits."""
    tok = (
        tbl(spark, sf_dir, "documents", fanout=True)
        .select("doc_id", F.explode(tokens("text")).alias("t"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("t"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    votes = tok.groupBy("doc_id").agg(*simhash_vote_aggs("h"))
    docs = votes.select(
        "doc_id",
        simhash_from_votes("v").alias("sim"),
    )
    chunk_structs = ", ".join(
        f"struct({c} AS chunk, (shiftright(sim, {c * 16}) & 65535) AS key)"
        for c in range(4)
    )
    chunks = docs.select(
        "doc_id",
        "sim",
        F.explode(F.expr(f"array({chunk_structs})")).alias("ck"),
    ).select("doc_id", "sim", "ck.chunk", "ck.key")
    # the 64-bit signature IS the payload the verification needs, so
    # carry it through the bucket grouping instead of re-joining the
    # signature table twice afterwards: collect (doc_id, sim) structs
    # per bucket, emit i<j pairs with both sims attached, verify
    # inline. Two fewer joins/shuffles than the generic
    # candidates→join-payload shape (which minhash still needs because
    # its payload — the full shingle array — is too wide to replicate
    # into every band bucket).
    grouped = (
        chunks.groupBy("chunk", "key")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "sim"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    # BUCKET_CAP-bounded expansion (same contract as capped_pairs_expr,
    # carrying the signatures): all pairs among the CAP lowest-id
    # structs + a star from the bucket min to everything past the cap.
    # An exact-duplicate class shares all four chunks, so the star
    # pairs verify at hamming 0 and the class stays fully connected;
    # expansion is O(d) past the cap instead of d(d-1)/2.
    ds = F.col("ds")
    head = F.slice(ds, 1, BUCKET_CAP)
    tail = F.slice(
        ds, BUCKET_CAP + 1, F.greatest(F.size(ds) - BUCKET_CAP, F.lit(0))
    )

    def _pair(x, y):
        return F.struct(
            x["doc_id"].alias("doc_a"),
            y["doc_id"].alias("doc_b"),
            hamming64(x["sim"], y["sim"]).alias("hamming"),
        )

    pairs = F.concat(
        F.flatten(
            F.transform(
                head,
                lambda x, i: F.transform(
                    F.slice(head, i + 2, F.size(head)), lambda y: _pair(x, y)
                ),
            )
        ),
        F.transform(tail, lambda y: _pair(F.element_at(ds, 1), y)),
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.hamming") <= 3)
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .distinct()
    )


# --------------------------------------------------------------------------
# C2 near-dup: embedding cosine
# --------------------------------------------------------------------------


@register(
    "dedup_embedding",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE {ORACLE_FINITE_VEC}
    )
    SELECT DISTINCT
           LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
    FROM e a JOIN e b
      ON a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-probe embedding-cosine dedup: score a bounded,
    deterministic anchor set exactly against the whole corpus and emit
    unordered near-dup pairs (cos >= 0.4) touching an anchor.

    This is the incremental-dedup shape used by real training-data
    pipelines (new batch = anchors, corpus = reference set): the
    anchors broadcast to every executor and the corpus streams through
    ONE scan — O(n·k) work, no corpus×corpus shuffle. The previous
    version's all-pairs `a.vec_id < b.vec_id` theta-join was an O(n²)
    BroadcastNestedLoopJoin over the full table — correct at fixture
    scale, a scale-killer at 10^9 vectors. Full-corpus *approximate*
    near-dup at scale is similarity.similarity_lsh; this operator is
    the exact path for a bounded probe set (here `vec_id % 20 = 0` as
    the deterministic fixture stand-in for an explicit anchor table).

    The anchor side is a broadcast nested-loop by construction, but
    against a BOUNDED build side: cost is linear in the corpus.
    tests/test_plans.py asserts the corpus is scanned once and never
    shuffled corpus×corpus.

    Corpus membership is finite_vec (--sparse/--nonfinite contract):
    a NaN/Inf component turns the cosine into NaN/±Inf, where Spark
    and DuckDB comparison semantics diverge — skip the poisoned
    vector on both engines instead."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(finite_vec())
        .select("vec_id", as_double("embedding").alias("v"))
    )
    anchors = e.filter(F.col("vec_id") % 20 == 0)
    return filter_compute_once(
        e.alias("b")
        .join(
            F.broadcast(anchors.alias("a")),
            F.col("a.vec_id") != F.col("b.vec_id"),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("vec_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        ),
        # filter_compute_once (r13): pushed below the projection, the
        # tau filter re-inlines the 64-dim cosine — the dominant
        # per-pair cost of the anchor scan — and every (anchor,
        # corpus) pair pays it twice.
        F.col("cos") >= 0.4,
    ).distinct()
