"""Mergeable sketch operators — fixed-memory approximate structures
whose partial states combine associatively, the only aggregation
family that keeps working when the group-by state itself would
overflow an executor (cf. the Cormode/Muthukrishnan count-min sketch,
J. Algorithms 2005). Spark's own HLL++ is exposed as
`approx_count_distinct` (query `approx_distinct`); this module builds
the sketches Spark does NOT ship natively, as plain aggregations —
so the 100 TB story is ordinary partial+final hash aggregation over a
state of fixed, tiny width.

Determinism: all hash functions are md5-derived (engine-portable, see
functions/numeric.py), so the DuckDB oracle replays the exact sketch
— estimates and all — not just the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2ck_spark.functions.numeric import finite, md5_bucket
from log2ck_spark.functions.plan import array_compute_once
from log2ck_spark.functions.text import shingles, tokens
from log2ck_spark.io import tbl
from log2ck_spark.queries import register

_CMS_DEPTH = 4  # independent hash rows
_CMS_WIDTH = 256  # counters per row
_CMS_TOPK = 20


@register(
    "sketch_count_min",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), grid AS (
      SELECT unnest(range({_CMS_DEPTH})) AS j
    ), cells AS (
      SELECT j,
             CAST(('0x' || substr(md5(tok || ':' || j), 1, 8)) AS BIGINT)
               % {_CMS_WIDTH} AS col,
             COUNT(*) AS c
      FROM toks CROSS JOIN grid
      GROUP BY 1, 2
    ), exact AS (
      SELECT tok, COUNT(*) AS n_exact FROM toks
      GROUP BY tok ORDER BY n_exact DESC, tok LIMIT {_CMS_TOPK}
    )
    SELECT e.tok AS term, e.n_exact, CAST(MIN(c.c) AS BIGINT) AS n_cms
    FROM exact e
    CROSS JOIN grid g
    JOIN cells c
      ON c.j = g.j
     AND c.col = CAST(('0x' || substr(md5(e.tok || ':' || g.j), 1, 8))
                      AS BIGINT) % {_CMS_WIDTH}
    GROUP BY 1, 2
    """,
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream: a {d}×{w}
    counter matrix (md5-derived hash per row), queried for the exact
    top-{k} terms — output is (term, exact count, CMS estimate), the
    estimate ≥ exact by construction, overshooting only on hash
    collisions. The oracle replays the identical sketch in DuckDB, so
    the ESTIMATES are value-checked, not just the baseline.

    Why a sketch at 100 TB: an exact per-term count holds |vocab|
    state; the CMS holds {d}·{w} counters NO MATTER the corpus — the
    build is one partial+final hash aggregation whose shuffle carries
    at most partitions×{d}·{w} pre-combined cells, and sketches from
    disjoint corpus shards MERGE by cell-wise addition (the partial
    agg IS that merge). Point queries then broadcast the ≤{d}·{w}-row
    sketch. The fixture's exact side doubles as the accuracy audit.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("tok"))
    # r13: aggregate occurrences to per-token counts FIRST (guide
    # §2.3 "aggregate before you shuffle"), then hash. The md5 cell
    # derivation drops from _CMS_DEPTH md5s per token OCCURRENCE to
    # per DISTINCT token (vocab << stream length), and because both
    # the cell build and the exact-top-k branch now consume the SAME
    # groupBy(tok) aggregation, runtime exchange reuse computes the
    # tokenize+count pass once instead of twice. Cell counts are
    # SUM(n) over tokens hashing to the cell — identical values.
    tok_counts = toks.groupBy("tok").agg(F.count("*").alias("n"))

    cell_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                md5_bucket(
                    F.concat(F.col("tok"), F.lit(f":{j}")), _CMS_WIDTH
                ).alias("col"),
            )
            for j in range(_CMS_DEPTH)
        ]
    )
    cells = (
        tok_counts.select(F.explode(cell_structs).alias("cell"), "n")
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.col").alias("col"))
        .agg(F.sum("n").alias("c"))
    )

    # query: exact top-k terms (the audit baseline), then min over rows
    exact = (
        tok_counts.withColumnRenamed("n", "n_exact")
        .orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "tok",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        md5_bucket(
                            F.concat(F.col("tok"), F.lit(f":{j}")), _CMS_WIDTH
                        ).alias("col"),
                    )
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("tok", "n_exact", "cell.j", "cell.col")
    return (
        probes.join(F.broadcast(cells), ["j", "col"])
        .groupBy(F.col("tok").alias("term"), "n_exact")
        .agg(F.min("c").alias("n_cms"))
    )


sketch_count_min.__doc__ = sketch_count_min.__doc__.format(
    d=_CMS_DEPTH, w=_CMS_WIDTH, k=_CMS_TOPK
)


# --------------------------------------------------------------------------
# HyperLogLog, replayed cross-engine
# --------------------------------------------------------------------------

_HLL_M = 512  # 2^9 registers
_HLL_P = 9  # log2(_HLL_M) — shift width for exact integer division
_HLL_ALPHA = 0.7197831133217303  # 0.7213 / (1 + 1.079/512), Flajolet et al.
_HLL_MAXRHO = 52  # 60-bit hash - 9 bucket bits -> 51 pattern bits, rho <= 52


def hll_group_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group distinct-count estimate via the SAME portable HLL that
    `sketch_hll` value-checks cross-engine (m={m} md5 registers,
    2^{rho}-scaled integer harmonic sum, linear-counting small-range
    correction) — factored out so `approx_distinct` shares the exact
    oracle-replayable estimator instead of Spark's HLL++ (whose
    register layout no other engine can replay, which kept that query
    rows-only for five rounds), and `sketch_hll` consumes the SAME
    kernel — there is exactly ONE copy of the bit-exact estimator to
    keep in lockstep with the DuckDB replay in `hll_oracle_cte`.
    Returns (group_col, est DOUBLE, n BIGINT, occupied BIGINT) where
    `n` is the group's TOTAL row count, `occupied` the non-empty
    register count (the linear-counting input, sketch_hll's audit
    column), and `est` ignores NULL values, matching
    COUNT(DISTINCT x) semantics — a group whose values are all NULL
    comes back with est = 0.0 (the linear-counting branch at zero
    occupancy), never dropped.

    ONE scan of the input (r8; previously the count was a second scan
    joined back — at 100 TB the scan IS the cost, and Catalyst cannot
    reuse it across the two differently-filtered branches): NULL-value
    rows ride the same register aggregation under a sentinel bucket
    (-1 — unreachable for real values, whose md5-derived h is
    non-negative so h % m >= 0), contribute a NULL rho that MAX()
    ignores and a row count that SUM() keeps. Same mergeable two-phase
    shape as sketch_hll — duplicates combine map-side into MAX(rho)
    registers, per-group state is a fixed {m} registers + one counter
    at any cardinality."""
    g, v = F.col(group_col), F.col(value_col)
    h = F.conv(F.substring(F.md5(v.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    rest = F.shiftright(F.col("h"), _HLL_P).cast("bigint")
    rho = F.when(F.col("h").isNull(), F.lit(None)).when(
        rest == 0, F.lit(_HLL_MAXRHO)
    ).otherwise(_HLL_MAXRHO - F.length(F.bin(rest)))
    registers = (
        df.select(g.alias("g"), h.alias("h"))
        .select(
            "g",
            F.coalesce(F.col("h") % _HLL_M, F.lit(-1)).alias("bucket"),
            rho.alias("r"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("m_rho"), F.count("*").alias("cnt"))
    )
    # contrib is NULL exactly on the sentinel bucket (m_rho NULL), so
    # SUM skips it and COUNT(m_rho) is the true register occupancy.
    contrib = F.pow(F.lit(2.0), _HLL_MAXRHO - F.col("m_rho")).cast("bigint")
    per_group = registers.groupBy("g").agg(
        F.sum("cnt").alias("n"),
        F.count("m_rho").alias("occupied"),
        (
            F.coalesce(F.sum(contrib), F.lit(0))
            + (_HLL_M - F.count("m_rho"))
            * F.pow(F.lit(2.0), F.lit(_HLL_MAXRHO)).cast("bigint")
        ).cast("bigint").alias("sum_scaled"),
    )
    raw = (
        F.lit(_HLL_ALPHA)
        * _HLL_M
        * _HLL_M
        * F.pow(F.lit(2.0), F.lit(_HLL_MAXRHO))
        / F.col("sum_scaled")
    )
    linear = _HLL_M * F.log(
        F.lit(float(_HLL_M)) / (_HLL_M - F.col("occupied"))
    )
    return per_group.select(
        F.col("g").alias(group_col),
        F.when((raw <= 2.5 * _HLL_M) & (F.col("occupied") < _HLL_M), linear)
        .otherwise(raw)
        .alias("est"),
        F.col("n"),
        F.col("occupied").cast("bigint").alias("occupied"),
    )


hll_group_stats.__doc__ = hll_group_stats.__doc__.format(
    m=_HLL_M, rho=_HLL_MAXRHO
)


def hll_oracle_cte(table: str, group_col: str, value_col: str) -> str:
    """DuckDB WITH-chain replaying `hll_group_stats`'s estimate
    bit-for-bit; ends in
    CTE ``hll_est(<group_col>, est, occupied)``. Callers append their
    own final SELECT (join exact counts, round, alias)."""
    return f"""
    WITH hashed AS (
      SELECT {group_col},
             CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM {table} WHERE {value_col} IS NOT NULL
    ), rho AS (
      SELECT {group_col}, h % {_HLL_M} AS bucket,
             CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_MAXRHO}
                  ELSE {_HLL_MAXRHO} - length(bin(h // {_HLL_M}))
             END AS r
      FROM hashed
    ), registers AS (
      SELECT {group_col}, bucket, MAX(r) AS m_rho
      FROM rho GROUP BY 1, 2
    ), per_group AS (
      SELECT {group_col},
             COUNT(*) AS occupied,
             CAST(SUM(CAST(pow(2.0, {_HLL_MAXRHO} - m_rho) AS BIGINT))
                  AS BIGINT)
               + CAST(({_HLL_M} - COUNT(*))
                      * pow(2.0, {_HLL_MAXRHO}) AS BIGINT) AS sum_scaled
      FROM registers GROUP BY 1
    ), raw_est AS (
      SELECT {group_col}, occupied,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
               * pow(2.0, {_HLL_MAXRHO}) / sum_scaled AS raw
      FROM per_group
    ), hll_est AS (
      SELECT {group_col},
             CASE WHEN raw <= 2.5 * {_HLL_M} AND occupied < {_HLL_M}
                  THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                     / ({_HLL_M} - occupied))
                  ELSE raw END AS est,
             occupied
      FROM raw_est
    )"""


def _sketch_hll_oracle() -> str:
    # The SAME DuckDB replay chain hll_group_stats is value-checked
    # against (and approx_distinct composes) — one estimator, one
    # oracle, zero hand-maintained copies to drift apart.
    return (
        hll_oracle_cte("events", "event_type", "user_id")
        + """
    , exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
      GROUP BY 1
    )
    SELECT x.event_type, x.n_exact,
           ROUND(COALESCE(h.est, 0), 4) AS n_hll,
           CAST(COALESCE(h.occupied, 0) AS BIGINT) AS n_occupied
    FROM exact x LEFT JOIN hll_est h
      ON x.event_type IS NOT DISTINCT FROM h.event_type
    """
    )


@register("sketch_hll", oracle=_sketch_hll_oracle())
def sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per event_type, replayed EXACTLY in
    both engines (Flajolet/Fusy/Gandouet/Meunier, AofA 2007 — the
    published algorithm, m=512 registers, md5-derived 60-bit hash,
    with the small-range linear-counting correction). Spark's native
    HLL++ (`approx_count_distinct`) has a register layout no other
    engine replays; THIS query makes the sketch itself the
    value-checked output: registers are engine-portable md5 buckets,
    and the harmonic sum is computed on 2^52-SCALED INTEGERS (each
    register contributes 2^(52-rho) exactly; bigint sum ≤ 2^61) so no
    float-accumulation order can perturb the estimate — DuckDB
    replays estimate-for-estimate, collision-for-collision.

    Scale shape: duplicates never shuffle (MAX(rho) partial-combines
    map-side); state is m=512 registers per group NO MATTER the
    cardinality, and registers from disjoint shards merge by MAX —
    the mergeable-sketch property that makes 100 TB distinct counts
    a two-stage aggregation. n_exact (countDistinct) rides along as
    the fixture-scale accuracy audit.

    The estimator itself lives in `hll_group_stats` (one kernel,
    shared with `approx_distinct`, replayed by `hll_oracle_cte`);
    this query joins the exact-count audit onto it and exposes the
    register occupancy. The audit join is NULL-SAFE on the group key
    (eqNullSafe / IS NOT DISTINCT FROM in the oracle): GROUP BY keeps
    a NULL event_type as a real group on both engines, and a plain
    equi-join would silently drop it from one side only — a
    Spark-vs-oracle row mismatch on any fixture containing NULL group
    keys (latent on the current NULL-free fixtures, tested in
    tests/test_maintenance.py)."""
    ev = tbl(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    stats = hll_group_stats(ev, "event_type", "user_id")
    return (
        stats.alias("s")
        .join(
            exact.alias("x"),
            F.col("s.event_type").eqNullSafe(F.col("x.event_type")),
        )
        .select(
            F.col("s.event_type").alias("event_type"),
            F.col("x.n_exact").alias("n_exact"),
            F.round("s.est", 4).alias("n_hll"),
            F.col("s.occupied").alias("n_occupied"),
        )
    )


# --------------------------------------------------------------------------
# Mergeable fixed-bin quantile histogram
# --------------------------------------------------------------------------

_QH_WIDTH = 5.0  # bin width over the value gauge
_QH_QS = (0.5, 0.95, 0.99)


@register(
    "sketch_quantile_hist",
    oracle=f"""
    WITH hist AS (
      SELECT event_type,
             CAST(floor(value / {_QH_WIDTH}) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM events
      -- a quantile estimator ignores NULL observations (SQL
      -- percentile semantics); without this both engines grew a NULL
      -- bin whose window placement ALSO diverged (--sparse gate).
      -- r10 --nonfinite extension: NaN/±Inf have no bin either —
      -- DuckDB's CAST(floor(nan/w) AS BIGINT) raises outright — so
      -- the observation set is the FINITE values on both engines.
      WHERE isfinite(value)
      GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cume,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    ), probes AS (
      SELECT event_type, bin, c, cume, cume - c AS before, n, q,
             CAST(ceil(q * n) AS BIGINT) AS r
      FROM cum CROSS JOIN (SELECT unnest([{", ".join(map(str, _QH_QS))}]) AS q) qs
    )
    SELECT event_type, q, CAST(n AS BIGINT) AS n, r AS target_rank,
           ROUND(bin * {_QH_WIDTH}
                 + {_QH_WIDTH} * (r - before) / c, 6) AS est
    FROM probes
    WHERE cume >= r AND before < r
    """,
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles (p50/p95/p99 per event_type) from a MERGEABLE
    fixed-bin histogram — the sketch answer to "exact percentile needs
    the whole sorted column". State is ≤ range/width bins per group
    regardless of row count; shard histograms merge by bin-wise
    addition (the partial agg), and any quantile then reads off the
    cumulative bin walk with linear interpolation inside the target
    bin. This is the classic Prometheus/monitoring `histogram_quantile`
    design, value-checked cross-engine: bins and ranks are exact
    integers, and the one float expression per row (rank→position
    interpolation) is the same IEEE arithmetic in both engines.

    Shape: one partial+final hash agg builds the histogram (the only
    corpus-wide stage; the shuffle carries pre-combined bins), then
    the cumulative walk windows over ≤ |types|×100 rows — driver-free
    and exact-rank-reproducible. Exact-percentile parity is covered
    separately by `percentile_agg`; this query's point is the
    fixed-memory estimate at 100 TB."""
    ev = tbl(spark, sf_dir, "events").where(finite("value"))
    from pyspark.sql import Window

    hist = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / _QH_WIDTH).cast("bigint").alias("bin"),
        )
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cume"),
        F.sum("c").over(w_all).alias("n"),
    )
    probes = cum.select(
        "*", F.explode(F.array(*[F.lit(q) for q in _QH_QS])).alias("q")
    ).withColumn("r", F.ceil(F.col("q") * F.col("n")).cast("bigint"))
    before = F.col("cume") - F.col("c")
    return (
        probes.filter((F.col("cume") >= F.col("r")) & (before < F.col("r")))
        .select(
            "event_type",
            "q",
            F.col("n").cast("bigint").alias("n"),
            F.col("r").alias("target_rank"),
            F.round(
                F.col("bin") * _QH_WIDTH
                + _QH_WIDTH * (F.col("r") - before) / F.col("c"),
                6,
            ).alias("est"),
        )
    )


# --------------------------------------------------------------------------
# Bloom filter, replayed cross-engine
# --------------------------------------------------------------------------

_BF_K = 3  # hash functions
_BF_BITS = 8190  # 130 words x 63 usable bits (bit 63 avoided: DuckDB
# overflow-checks `1::BIGINT << 63`, Spark wraps silently — 63 bits
# per word keeps every mask positive and both engines identical)
_BF_WORDBITS = 63


@register(
    "sketch_bloom",
    oracle=f"""
    WITH evalg AS (
      SELECT DISTINCT
             unnest(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents WHERE source = 'src0'
    ), bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(gram || ':' || j), 1, 8)) AS BIGINT)
               % {_BF_BITS} AS bit
      FROM evalg CROSS JOIN (SELECT unnest(range({_BF_K})) AS j)
    ), bloom AS (
      SELECT bit // {_BF_WORDBITS} AS word,
             bit_or((1::BIGINT) << (bit % {_BF_WORDBITS})) AS bits
      FROM bits GROUP BY 1
    ), traing AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
             )) AS gram
      FROM documents WHERE source <> 'src0'
    ), probes AS (
      SELECT t.doc_id, t.gram, j.j,
             CAST(('0x' || substr(md5(t.gram || ':' || j.j), 1, 8)) AS BIGINT)
               % {_BF_BITS} AS bit
      FROM traing t CROSS JOIN (SELECT unnest(range({_BF_K})) AS j) j
    ), checked AS (
      SELECT p.doc_id, p.gram,
             MIN(CASE WHEN (COALESCE(b.bits, 0)
                            & ((1::BIGINT) << (p.bit % {_BF_WORDBITS}))) != 0
                      THEN 1 ELSE 0 END) AS all_set
      FROM probes p
      LEFT JOIN bloom b ON b.word = p.bit // {_BF_WORDBITS}
      GROUP BY 1, 2
    ), exact AS (
      SELECT DISTINCT t.doc_id, t.gram
      FROM traing t JOIN evalg e USING (gram)
    )
    SELECT c.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(c.all_set) AS BIGINT) AS n_bloom_hits,
           CAST(COUNT(e.gram) AS BIGINT) AS n_exact_hits
    FROM checked c
    LEFT JOIN exact e ON e.doc_id = c.doc_id AND e.gram = c.gram
    GROUP BY c.doc_id
    """,
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination prefilter, replayed exactly in both
    engines (Bloom, CACM 1970): the eval set's distinct 5-grams set
    k={k} md5-derived bits in an m={m}-bit filter stored as 63-bit
    words built with a BIT_OR aggregation; every train doc's grams
    probe the broadcast filter. Output per train doc: gram count,
    Bloom hit count, and the exact hit count (via the real join) —
    so the false-positive overshoot n_bloom_hits ≥ n_exact_hits is
    itself value-checked, bit for bit.

    Why this matters at 100 TB: the exact decontamination join
    (decontaminate_overlap/span) shuffles every train gram; the Bloom
    table is {m} bits TOTAL — it broadcasts everywhere for free, the
    probe is a map-side bitwise AND, and only the ~hits (true ∪
    false positives) ever need the exact verification join. The
    filter itself is mergeable (BIT_OR of shard filters = corpus
    filter), the same two-phase aggregation shape as the other
    sketches. This is the standard scale recipe: Bloom prefilter →
    exact verify on survivors."""
    d = tbl(spark, sf_dir, "documents")
    # array_compute_once (r13): the inferred generator filter re-ran
    # the 5-gram shingle pipeline twice more per row on both explode
    # branches (full query 1.51 → 1.33 s with the duplication removed).
    evalg = (
        d.filter(F.col("source") == "src0")
        .select(
            F.explode(array_compute_once(shingles("text", w=5))).alias("gram")
        )
        .distinct()
    )
    bit_for = lambda gram_col, j: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(gram_col, F.lit(f":{j}"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _BF_BITS
    )
    # r13 (guide §2.4): the filter is 130 words TOTAL, so carry it as
    # ONE row instead of a 130-row join table. The old shape exploded
    # k bit-probes per train gram (3x the rows), broadcast-hash-joined
    # each probe against the word table, and re-aggregated back to
    # (doc_id, gram) through a full exchange; the probe is now a
    # single codegen'd forall over the k bit positions against a
    # word->bits map attached by a one-row crossJoin — no probe
    # explode, no probe join, no (doc_id, gram) re-aggregation. The
    # bits.distinct() exchange is gone too: bit_or is idempotent, so
    # pre-deduplicating bit positions bought nothing.
    bits = evalg.select(
        F.explode(
            F.array(*[bit_for(F.col("gram"), j) for j in range(_BF_K)])
        ).alias("bit")
    )
    bloom = (
        bits.groupBy((F.col("bit") / _BF_WORDBITS).cast("bigint").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, cast(bit % {_BF_WORDBITS} as int)))"
            ).alias("bits")
        )
    )
    # densify to a 130-slot array (index = word + 1): element_at on a
    # Spark MAP is a linear entry scan, so probing the sparse map paid
    # O(130) per bit; the dense array probe is O(1).
    n_words = _BF_BITS // _BF_WORDBITS
    bf = (
        bloom.groupBy()
        .agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
                "m"
            )
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.coalesce(
                    F.element_at(F.col("m"), w.cast("bigint")),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("bf")
        )
    )
    traing = (
        d.filter(F.col("source") != "src0")
        .select(
            "doc_id",
            F.explode(array_compute_once(shingles("text", w=5))).alias("gram"),
        )
        .distinct()
    )
    probe_one = lambda b: (  # noqa: E731
        F.element_at(
            F.col("bf"), ((b / _BF_WORDBITS).cast("int") + F.lit(1))
        ).bitwiseAND(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                (b % _BF_WORDBITS).cast("int"),
            )
        )
        != 0
    )
    all_set = F.when(
        F.forall(
            F.array(*[bit_for(F.col("gram"), j) for j in range(_BF_K)]),
            probe_one,
        ),
        1,
    ).otherwise(0)
    checked = traing.crossJoin(F.broadcast(bf)).select(
        "doc_id", "gram", all_set.alias("all_set")
    )
    # exact hits: evalg is distinct on gram, so a left join attaches at
    # most one hit marker per (doc_id, gram) — the old separate
    # traing x evalg inner-join + distinct + (doc_id, gram) re-join
    # recomputed the whole train shingle pipeline a second time. The
    # eval side is broadcast: it is the same bounded benchmark set the
    # 8190-bit filter summarizes.
    return (
        checked.join(
            F.broadcast(evalg.withColumn("hit", F.lit(1))), ["gram"], "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("all_set").cast("bigint").alias("n_bloom_hits"),
            F.count("hit").cast("bigint").alias("n_exact_hits"),
        )
    )


sketch_bloom.__doc__ = sketch_bloom.__doc__.format(k=_BF_K, m=_BF_BITS)
