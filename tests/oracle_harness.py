"""Local replica of the driver's DuckDB-oracle comparison: run a
registered query on Spark and its oracle on DuckDB over the same
parquet, compare row count + column names + order-insensitive values
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb

from log2ck_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_df()


# --------------------------------------------------------------------------
# Hostile fixture: sf0.001 with NULLs injected into every GROUP-BY-able
# key column. Real data has NULL keys; the driver's fixtures do not, so
# a query and its oracle can silently disagree on NULL-key semantics
# (Spark concat() nulls a whole line where DuckDB's skips the arg;
# equi-joins drop NULL keys; ASC sorts place NULL first vs last) and
# stay green for rounds. Found live in r8: 10 of 169 oracle-bearing
# queries diverged here before the corpus-completeness and null-safe-
# join fixes. `python scripts/driver_replica.py --hostile` replays the
# full registry on this fixture; tests/test_hostile_parity.py pins the
# sentinel subset.
# --------------------------------------------------------------------------

_HOSTILE_REWRITES = {
    # ~10% NULL group keys, deterministic by primary key. Full-query
    # templates: `{t}` expands to the source table's read_parquet().
    "events": (
        "SELECT event_id, ts, user_id,"
        " CASE WHEN event_id % 10 = 3 THEN NULL ELSE event_type END"
        " AS event_type, value, props FROM {t}"
    ),
    "documents": (
        "SELECT doc_id, text,"
        " CASE WHEN doc_id % 11 = 4 THEN NULL ELSE lang END AS lang,"
        " CASE WHEN doc_id % 13 = 5 THEN NULL ELSE source END AS source,"
        " n_chars FROM {t}"
    ),
    "embeddings": (
        "SELECT vec_id, embedding,"
        " CASE WHEN vec_id % 7 = 2 THEN NULL ELSE label END AS label"
        " FROM {t}"
    ),
}

# --------------------------------------------------------------------------
# Ties fixture: the SECOND hostile dimension — massive duplicate sort
# keys. The r8 stream_session_window defect was exactly this class: an
# oracle whose running-SUM ordered by ts alone while the Spark side
# ordered by (ts, event_id) — invisible on fixtures where every ts is
# distinct (sf0.001 events: 1000 rows, 1000 distinct ts), and
# nondeterministic in production where timestamps collide constantly.
# This fixture makes collisions the NORM: events.ts is collapsed onto
# a 6-hour grid (~8 rows per tick, ties within every user's session),
# events.value is quantized to a ~14-value grid (ORDER BY value ties),
# 25% of documents share one constant text (dedup representative +
# n_chars-ordering ties), ~17% of embeddings are the SAME vector
# (cosine-similarity ties in every top-k), and o_totalprice is
# quantized to the nearest 1000 (TPC-H top-k boundary ties). Any
# query/oracle pair whose output depends on tie order without a shared
# total tiebreak diverges here.
# --------------------------------------------------------------------------

_TIES_TEXT = (
    "the quick brown fox jumps over the lazy dog and then jumps over"
    " the lazy dog again because duplicated corpus text is the point"
)

_TIES_REWRITES = {
    "events": (
        "SELECT event_id, time_bucket(INTERVAL '6 hours', ts) AS ts,"
        " user_id, event_type, round(value / 25) * 25 AS value, props"
        " FROM {t}"
    ),
    "documents": (
        f"SELECT doc_id,"
        f" CASE WHEN doc_id % 4 = 1 THEN '{_TIES_TEXT}' ELSE text END"
        f" AS text, lang, source,"
        f" CASE WHEN doc_id % 4 = 1 THEN length('{_TIES_TEXT}')"
        f" ELSE n_chars END AS n_chars FROM {{t}}"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 6 = 2 THEN"
        " (SELECT embedding FROM {t} ORDER BY vec_id LIMIT 1)"
        " ELSE embedding END AS embedding, label FROM {t}"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " round(o_totalprice / 1000) * 1000 AS o_totalprice,"
        " o_orderdate, o_orderpriority FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Unicode fixture: the THIRD hostile dimension — multibyte, multi-
# script text. The synthetic corpora are pure ASCII, so every textop's
# Spark (Java regex / UTF8String) and DuckDB (PCRE-ish RE2 / UTF-8)
# semantics agree trivially. Real corpora are CJK, emoji (with
# zero-width joiners), decomposed combining accents, and RTL scripts —
# exactly where \\w classes, casing, codepoint counting, and substring
# boundaries can diverge between engines. 40% of documents get one of
# four unicode archetype texts (n_chars recomputed so the
# n_chars == length(text) corpus invariant holds) and one event_type
# value gains a multibyte suffix so group keys, sorts, and string
# matches all cross the ASCII boundary.
# --------------------------------------------------------------------------

_UNI_CJK = "数据处理引擎的测试文本 需要覆盖中文分词与字符统计 的边界情况"
_UNI_EMOJI = "rocket 🚀 launch day 🎉 with family 👨‍👩‍👧‍👦 and flags 🇺🇳 done ✅"
# NFC é (U+00E9) AND decomposed e+U+0301 in one string — codepoint
# counting and normalization-sensitive ops must see both forms
_UNI_ACCENT = "résumé résumé naivë francaiş dejà vu"
_UNI_RTL = "الحوسبة الموزعة mixed مع نص latin وعربي bidirectional text"

_UNICODE_REWRITES = {
    # n_chars recomputed from the REWRITTEN text in an outer select so
    # the corpus invariant n_chars == length(text) holds by
    # construction (one CASE, not two copies to edit in lockstep)
    "documents": (
        f"SELECT doc_id, text, lang, source, length(text) AS n_chars"
        f" FROM (SELECT doc_id,"
        f" CASE WHEN doc_id % 10 = 2 THEN '{_UNI_CJK}'"
        f" WHEN doc_id % 10 = 5 THEN '{_UNI_EMOJI}'"
        f" WHEN doc_id % 10 = 7 THEN '{_UNI_ACCENT}'"
        f" WHEN doc_id % 10 = 9 THEN '{_UNI_RTL}'"
        f" ELSE text END AS text, lang, source FROM {{t}})"
    ),
    "events": (
        "SELECT event_id, ts, user_id,"
        " CASE WHEN event_id % 3 = 1 THEN event_type || '_событие_🧪'"
        " ELSE event_type END AS event_type, value, props FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Bad-JSON fixture: the FOURTH hostile dimension — a props column that
# is not the well-formed {"k": <int>} the generator always emits. Real
# log pipelines ship truncated writes, non-JSON debris, empty fields,
# wrong-typed values, and array roots. Two engine asymmetries hide
# here: DuckDB's json_extract_string RAISES on malformed JSON where
# Spark's get_json_object returns NULL (oracle must TRY_CAST to JSON
# first), and ANSI-mode CAST('oops' AS INT) raises on BOTH engines
# where the intent is NULL (both sides must TRY_CAST). Known
# out-of-contract corner (not in this fixture, documented here):
# decimal-string k like '{"k": "3.7"}' — Spark try_cast(int) yields
# NULL while DuckDB TRY_CAST rounds to 4; the generator's k is always
# a JSON integer.
# --------------------------------------------------------------------------

# NB: {{ }} because these templates go through .format(t=...)
_BADJSON_REWRITES = {
    "events": (
        "SELECT event_id, ts, user_id, event_type, value,"
        " CASE event_id % 17"
        "   WHEN 1 THEN '{{\"k\": 1'"          # truncated write
        "   WHEN 4 THEN 'not json'"            # non-JSON debris
        "   WHEN 6 THEN ''"                    # empty field
        "   WHEN 9 THEN '{{\"k\": \"oops\"}}'"  # wrong-typed value
        "   WHEN 11 THEN '[3, 4]'"             # array root
        "   WHEN 14 THEN '{{\"j\": {{\"n\": 2}}}}'"  # missing k, nested
        "   ELSE props END AS props FROM {t}"
    ),
}

# --------------------------------------------------------------------------
# Extreme-magnitude fixture: the FIFTH hostile dimension (r10, the
# decimal -> TRY_CAST migration's end-to-end gate). Values at and past
# the decimal(18,6) |x| < 1e12 domain bound injected into EVERY double
# column the exact-aggregate contract sums (events.value, lineitem
# prices/quantities, orders.o_totalprice, customer.c_acctbal — byte
# counters and epoch-nanos land in metric fields in real log data).
# Pre-migration this fixture killed every exact-aggregate query with
# NUMERIC_VALUE_OUT_OF_RANGE under ANSI; the contract now is that
# out-of-range values NULL-skip IDENTICALLY on both engines, so all
# 169 must stay green. 999999999999.5 sits just INSIDE decimal(18,6)
# (max 999999999999.999999) to pin boundary inclusion; magnitudes stay
# <= 1e15 so derived bigint casts (floor(value*10) in the accesslog
# renderer) stay inside int64. Embeddings are deliberately NOT
# rewritten: embedding floats are model-bounded by construction.
# --------------------------------------------------------------------------

_BIGNUM_REWRITES = {
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE event_id % 19"
        "   WHEN 3 THEN 1e15"
        "   WHEN 7 THEN -2.5e14"
        "   WHEN 12 THEN 999999999999.5"
        "   ELSE value END AS value, props FROM {t}"
    ),
    "lineitem": (
        "SELECT * REPLACE("
        " CASE l_orderkey % 13 WHEN 2 THEN 8.5e14"
        "   ELSE l_extendedprice END AS l_extendedprice,"
        " CASE l_orderkey % 17 WHEN 5 THEN 3.2e13"
        "   ELSE l_quantity END AS l_quantity) FROM {t}"
    ),
    "orders": (
        "SELECT * REPLACE(CASE o_orderkey % 11 WHEN 4 THEN 7.7e14"
        " ELSE o_totalprice END AS o_totalprice) FROM {t}"
    ),
    "customer": (
        "SELECT * REPLACE(CASE c_custkey % 9 WHEN 2 THEN -6.1e13"
        " ELSE c_acctbal END AS c_acctbal) FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Timewarp fixture: the SIXTH hostile dimension — hostile timestamps
# and dates. The generator's events.ts lives in one tidy modern range,
# so every time-family query (bucketing, sessionization, windows,
# resampling, cohorts, the dated sink) agrees with its oracle without
# ever exercising the epoch sign boundary or conversion precision.
# Real log data has clock-skewed agents, 1970-01-01 defaults from
# zeroed fields, and far-future garbage. The hostile values, each a
# distinct divergence class:
#   * 1969-12-31 23:59:59.999999 — epoch = -1 µs: floor(-1e-6) = -1
#     but truncation-toward-zero = 0, so any second-granularity bucket
#     built with CAST/::BIGINT instead of floor() puts the row in the
#     wrong bucket (and only for pre-1970 rows).
#   * 1969-07-20 20:17:40.5 / 23:59:59 integral — negative fractional
#     and negative integral epochs.
#   * 1970-01-01 00:00:00 — epoch 0 exactly (sign-boundary bucket).
#   * 2249-12-31 23:59:59.999999 — epoch ≈ 8.8e9 s, where DOUBLE's ulp
#     is ~2e-6 s: DuckDB's epoch(ts) DOUBLE rounds .999999 UP to the
#     next integral second, so floor(epoch(ts)/w) lands one bucket
#     late vs Spark's exact integer-microsecond floorDiv — oracles
#     must derive buckets from epoch_us(ts) (BIGINT), never epoch(ts).
#     Chosen inside pandas' datetime64[ns] range (max 2262-04-11).
#   * 2024-02-29 23:59:59 — leap day at the day-truncation boundary.
#   * date_trunc('hour', ts) — instants EXACTLY on bucket boundaries
#     (half-open window membership must agree).
#   * ts - 100 years — scattered deep past preserving sub-day
#     structure (century-scale gaps through every diff/rate path).
# Dates get the same treatment where TPC-H queries do date arithmetic
# (orders.o_orderdate, lineitem.l_shipdate): pre-1970 and far-future
# values flow through year-extraction, interval comparison, and
# cohort-week paths on both engines.
# --------------------------------------------------------------------------

_TIMEWARP_REWRITES = {
    "events": (
        "SELECT event_id,"
        " CASE event_id % 29"
        "   WHEN 2 THEN TIMESTAMP '1969-12-31 23:59:59.999999'"
        "   WHEN 5 THEN TIMESTAMP '1969-07-20 20:17:40.5'"
        "   WHEN 7 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "   WHEN 11 THEN TIMESTAMP '2249-12-31 23:59:59.999999'"
        "   WHEN 13 THEN TIMESTAMP '2024-02-29 23:59:59'"
        "   WHEN 17 THEN date_trunc('hour', ts)"
        "   WHEN 19 THEN ts - INTERVAL 100 YEAR"
        "   WHEN 23 THEN TIMESTAMP '1969-12-31 23:59:59'"
        "   ELSE ts END AS ts,"
        " user_id, event_type, value, props FROM {t}"
    ),
    "orders": (
        "SELECT * REPLACE("
        " CASE o_orderkey % 7 WHEN 2 THEN DATE '1969-12-29'"
        "   WHEN 4 THEN DATE '2199-06-15'"
        "   ELSE o_orderdate END AS o_orderdate) FROM {t}"
    ),
    "lineitem": (
        "SELECT * REPLACE("
        " CASE l_orderkey % 11 WHEN 3 THEN DATE '1969-12-31'"
        "   WHEN 7 THEN DATE '2149-01-01'"
        "   ELSE l_shipdate END AS l_shipdate) FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Sparse fixture: the SEVENTH hostile dimension — NULLs in every
# non-key VALUE column. The --hostile gate covers NULL GROUP KEYS;
# this is its complement: NULL measures and payloads, which real
# pipelines produce constantly (failed extractions → NULL text,
# crashed embedding jobs → NULL vectors, absent metric fields → NULL
# value, missing money columns in CDC feeds). The divergence classes
# hiding here: COUNT(*) vs COUNT(col) confusions, AVG denominators
# (rows vs non-NULL rows), NULL propagation through arithmetic
# (price * (1 - discount)), aggregates over all-NULL groups (SUM →
# NULL, not 0), Python/Arrow UDF paths receiving None where they
# assume a string/array, and sort placement of NULL measure values.
# documents.text and n_chars go NULL TOGETHER so the corpus invariant
# n_chars == length(text) keeps holding (both engines see the same
# NULL row; a textop must skip it, not crash). Embedding NULLs hit
# every vector kernel (normalize/cosine/kmeans/LSH/IVF) at the Arrow
# boundary where np.stack over a None is a TypeError, not a wrong
# number.
# --------------------------------------------------------------------------

_SPARSE_REWRITES = {
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE WHEN event_id % 6 = 1 THEN NULL ELSE value END AS value,"
        " CASE WHEN event_id % 15 = 2 THEN NULL ELSE props END AS props"
        " FROM {t}"
    ),
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN doc_id % 9 = 3 THEN NULL ELSE text END AS text,"
        " lang, source,"
        " CASE WHEN doc_id % 9 = 3 THEN NULL ELSE n_chars END AS n_chars"
        " FROM {t}"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 8 = 5 THEN NULL ELSE embedding END"
        " AS embedding, label FROM {t}"
    ),
    "lineitem": (
        "SELECT * REPLACE("
        " CASE l_orderkey % 19 WHEN 6 THEN NULL"
        "   ELSE l_discount END AS l_discount,"
        " CASE l_orderkey % 23 WHEN 8 THEN NULL"
        "   ELSE l_extendedprice END AS l_extendedprice) FROM {t}"
    ),
    "orders": (
        "SELECT * REPLACE(CASE o_orderkey % 21 WHEN 9 THEN NULL"
        " ELSE o_totalprice END AS o_totalprice) FROM {t}"
    ),
    "customer": (
        "SELECT * REPLACE(CASE c_custkey % 13 WHEN 4 THEN NULL"
        " ELSE c_acctbal END AS c_acctbal) FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Blank fixture: the EIGHTH hostile dimension — EMPTY and
# WHITESPACE-ONLY strings, the class between "present" and "NULL"
# that every real corpus carries (empty extraction results, fields
# that are all padding, keys that are ''). Distinct from --hostile
# (NULL keys) and --sparse (NULL payloads): an empty STRING is a
# value — it forms its own group, joins, sorts before everything,
# and flows into length/ratio arithmetic as a ZERO, where ANSI-mode
# Spark raises on division by zero that DuckDB turns into NULL/inf.
# The divergence classes probed: ratio features over n_chars = 0
# docs (gopher rules, entropy, repetition, quality scores),
# tokenizers of '' and of whitespace-only text (split('') is [''] in
# some engines, [] in others), shingle/fingerprint kernels over
# zero-shingle docs, '' as a group key next to NULL keys, and the
# monolog grammar facing an empty event_type ('' can't match \w+ —
# parse-family oracles must dead-letter it identically).
# n_chars is recomputed from the rewritten text so the corpus
# invariant n_chars == length(text) holds (0 for '', the padding
# length for whitespace-only).
# --------------------------------------------------------------------------

_BLANK_REWRITES = {
    "documents": (
        "SELECT doc_id, text, lang, source, length(text) AS n_chars"
        " FROM (SELECT doc_id,"
        " CASE WHEN doc_id % 10 = 6 THEN ''"
        "      WHEN doc_id % 10 = 8 THEN '   ' || chr(9) || chr(10) || '  '"
        "      ELSE text END AS text,"
        " CASE WHEN doc_id % 17 = 3 THEN '' ELSE lang END AS lang,"
        " source FROM {t})"
    ),
    "events": (
        "SELECT event_id, ts, user_id,"
        " CASE WHEN event_id % 13 = 4 THEN ''"
        "      WHEN event_id % 13 = 9 THEN '  '"
        "      ELSE event_type END AS event_type,"
        " value, props FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Dupes fixture: the TENTH hostile dimension — a DUPLICATE-HEAVY
# corpus. The clean fixtures have zero exact-duplicate documents and
# --ties caps its shared-text class at 25%; real web-crawl corpora are
# the opposite (boilerplate pages, mirrored sites, retried ingestion),
# and duplicate mass is exactly where the dedup/cluster/sketch family
# does its real work. Classes injected (all deterministic by key, all
# under BUCKET_CAP=1024 so capped pair expansion remains EXACTLY the
# full i<j expansion and the all-pairs oracles stay comparable —
# above-cap behavior is pinned separately in tests/test_dedup_scale.py):
#   * documents: 40% collapse onto ONE text (a 200-copy class at
#     sf0.001 — every MinHash band, simhash chunk, and winnow
#     fingerprint of the class lands in one bucket), plus a 4%
#     NEAR-duplicate satellite (the same text + a 4-token coda;
#     5-shingle Jaccard ≈ 0.9, so LSH must merge the two classes)
#     and a 4% token-PERMUTED class (reversed word order: same token
#     SET — dedup_fingerprint collapses it — but near-zero shingle
#     Jaccard, so near-dup queries must NOT merge it).
#   * embeddings: 40% share one exact vector + 14% share a second —
#     IVF cells and LSH buckets with huge duplicate mass, kmeans with
#     degenerate point multiplicity, cosine top-k saturated with 1.0
#     scores (tie-broken by id per the established contract).
#   * events: 25% collapse EVERY non-key column onto one constant row
#     (same ts, user, type, value, props; distinct event_id) — the
#     full-row-duplicate class that stresses DISTINCT, HLL sketches
#     near-tiny true cardinality, one giant group in every groupBy,
#     and 250-deep ties in every running window.
# n_chars is recomputed from the rewritten text so the corpus
# invariant n_chars == length(text) holds.
# --------------------------------------------------------------------------

_DUPES_TEXT = (
    "breaking update mirrored boilerplate page content syndicated"
    " across many hosts with identical navigation header footer and"
    " legal disclaimer text repeated verbatim on every crawl snapshot"
    " of the original article body published once then copied forever"
)

_DUPES_REWRITES = {
    "documents": (
        f"SELECT doc_id, text, lang, source, length(text) AS n_chars"
        f" FROM (SELECT doc_id,"
        f" CASE WHEN doc_id % 5 IN (0, 1) THEN '{_DUPES_TEXT}'"
        f" WHEN doc_id % 25 = 2 THEN"
        f"   '{_DUPES_TEXT}' || ' crawler appended tracking suffix'"
        f" WHEN doc_id % 25 = 9 THEN"
        f"   array_to_string(list_reverse(string_split('{_DUPES_TEXT}', ' ')), ' ')"
        f" ELSE text END AS text, lang, source FROM {{t}})"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 5 IN (1, 3) THEN"
        "   (SELECT embedding FROM {t} ORDER BY vec_id LIMIT 1)"
        " WHEN vec_id % 7 = 4 THEN"
        "   (SELECT embedding FROM {t} ORDER BY vec_id LIMIT 1 OFFSET 1)"
        " ELSE embedding END AS embedding, label FROM {t}"
    ),
    "events": (
        "SELECT event_id,"
        " CASE WHEN event_id % 4 = 1"
        "   THEN (SELECT min(ts) FROM {t}) ELSE ts END AS ts,"
        " CASE WHEN event_id % 4 = 1 THEN 1 ELSE user_id END AS user_id,"
        " CASE WHEN event_id % 4 = 1"
        "   THEN (SELECT min(event_type) FROM {t})"
        "   ELSE event_type END AS event_type,"
        " CASE WHEN event_id % 4 = 1 THEN 42.0 ELSE value END AS value,"
        " CASE WHEN event_id % 4 = 1 THEN '{{\"k\": 7}}' ELSE props END"
        "   AS props FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Jumbo fixture: the ELEVENTH hostile dimension — OUTLIER-SIZED
# documents and log lines. Web crawls routinely carry single documents
# 1000× the median (concatenated boilerplate, minified JS, base64
# blobs), and a log pipeline meets multi-hundred-KB lines (stack
# traces, embedded payloads). The fixtures' docs are all ~100-500
# chars, so every text kernel's behavior at outlier size — tokenizer
# and shingle arrays with 20k elements, regex over 100 KB unbroken
# tokens (backtracking risk differs per engine), repetition stats at
# extreme ratios, winnowing windows over huge grams, BPE-ish token
# regex on megastrings, JSON extraction from 50 KB props rendered
# into 50 KB monolog lines — is untested. Classes injected
# (deterministic, one doc each so the all-pairs oracles stay
# tractable):
#   * doc_id 7: ~180 KB of 20,000 DISTINCT pseudo-random words (md5 of
#     the position) — huge token AND shingle sets, near-zero overlap
#     with everything.
#   * doc_id 13: ONE unbroken ~99 KB token (no spaces) — the tokenizer
#     yields a single giant token, the shingle guard (n >= w) hits at
#     scale, char-level kernels walk 99 KB in one value.
#   * doc_id 21: 'spam ' × 30,000 — 150 KB, 30k tokens, ONE distinct
#     token/shingle: maximal repetition ratios, fingerprint collapse.
#   * events: one 50 KB props value (event_id % 211 = 9) that the
#     monolog renderer embeds into a ~50 KB log line — the parse
#     grammars must extract from mega-lines identically.
# n_chars is recomputed so the corpus invariant holds.
# --------------------------------------------------------------------------

# --single: every table cut to exactly ONE deterministic row (lowest
# primary key) — the harshest populated corpus. The target class is
# n=1 sample statistics (stddev_samp/var_samp are NULL-vs-NaN
# battlegrounds cross-engine), percentile/histogram interpolation
# over one observation, EWMA/rate/window kernels on a single point,
# and joins whose other side lost its matching row. --empty covers
# n=0; sf0.001 covers "plenty"; n=1 is the boundary in between.
_SINGLE_KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}
_SINGLE_REWRITES = {
    t: f"SELECT * FROM {{t}} ORDER BY {k} LIMIT 1"
    for t, k in _SINGLE_KEYS.items()
}

# --empty: every table present with its full schema and ZERO rows —
# the day-one deployment / fully-filtered-partition state. The class
# of defect this targets is driver-side parameter derivation
# (.first()/.collect()[0] on an empty corpus → crash or a poisoned
# constant) and any query/oracle pair that disagrees on whether a
# degenerate aggregate yields one row or none. tests/test_degenerate.py
# proves every query RUNS on thin data; this gate proves the VALUES
# still match the oracle at zero rows.
_EMPTY_REWRITES = {t: "SELECT * FROM {t} LIMIT 0" for t in TABLES}

_JUMBO_REWRITES = {
    "documents": (
        "SELECT doc_id, text, lang, source, length(text) AS n_chars"
        " FROM (SELECT doc_id,"
        " CASE WHEN doc_id = 7 THEN"
        "   array_to_string([substr(md5((doc_id * 100000 + i)::VARCHAR),"
        "     1, 8) for i in range(1, 20001)], ' ')"
        " WHEN doc_id = 13 THEN repeat('megatoken', 11000)"
        " WHEN doc_id = 21 THEN rtrim(repeat('spam ', 30000))"
        " ELSE text END AS text, lang, source FROM {t})"
    ),
    "events": (
        "SELECT event_id, ts, user_id, event_type, value,"
        " CASE WHEN event_id % 211 = 9 THEN"
        "   '{{\"k\": 7, \"pad\": \"' || repeat('x', 50000) || '\"}}'"
        " ELSE props END AS props FROM {t}"
    ),
}


# --------------------------------------------------------------------------
# Non-finite fixture: the NINTH hostile dimension — NaN and ±Infinity
# in every double MEASURE column. JSON logs can't carry non-finite
# floats, but parquet/protobuf/CSV pipelines ship them constantly
# (0/0 in an upstream rate calc → NaN, counter overflow → inf, a
# crashed embedding job → NaN components). The engine asymmetries
# probed (r10 session probes, pinned in tests/test_hostile_parity.py):
#   * the exact-aggregate chain: Spark try_cast(nan/inf → decimal) is
#     NULL; DuckDB's DIRECT TRY_CAST(nan AS DECIMAL) RAISES (a DuckDB
#     TRY_CAST hole) while the contract's VARCHAR route
#     TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL) is NULL — so dsum/davg
#     NULL-skip identically, but any oracle that shortcuts the VARCHAR
#     hop dies on the first NaN.
#   * STDDEV_SAMP over a group containing inf: Spark → NaN, DuckDB →
#     "Out of Range Error" (a hard raise) — decimal-exact moment
#     queries must skip non-finite on BOTH sides.
#   * exact percentiles: both sort NaN last, but interpolation between
#     a finite value and NaN differs from rank-picking — quantile
#     oracles must exclude NaN explicitly.
#   * bucket arithmetic: floor(inf/w) :: int raises under ANSI Spark
#     AND plain-CAST DuckDB; histogram queries need a finite filter or
#     try_cast on both engines.
#   * Arrow kernels: np.stack over a NaN-component vector is fine but
#     every norm/cosine goes NaN — vector queries extend the
#     NULL-embedding skip contract (--sparse) to non-finite vectors.
# Injection is deterministic by primary key, ~13% of events and two
# lineitem stripes + one orders stripe (the TPC-H suite must survive,
# not be quarantined); embeddings get NaN/inf COMPONENTS, not NULL
# vectors, so the skip has to look at the values. -0.0 is deliberately
# NOT injected: both engines group/min/max it as 0.0 but render the
# sign bit differently through repr(), which the canonical comparator
# would flag without any semantic divergence (documented in PARITY.md
# instead).
# --------------------------------------------------------------------------

_NONFINITE_REWRITES = {
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE event_id % 23"
        "   WHEN 3 THEN 'nan'::DOUBLE"
        "   WHEN 7 THEN 'inf'::DOUBLE"
        "   WHEN 11 THEN '-inf'::DOUBLE"
        "   ELSE value END AS value, props FROM {t}"
    ),
    "lineitem": (
        "SELECT * REPLACE("
        " CASE l_orderkey % 13 WHEN 2 THEN 'nan'::DOUBLE"
        "   WHEN 6 THEN 'inf'::DOUBLE"
        "   ELSE l_extendedprice END AS l_extendedprice,"
        " CASE l_orderkey % 17 WHEN 5 THEN '-inf'::DOUBLE"
        "   ELSE l_discount END AS l_discount) FROM {t}"
    ),
    "orders": (
        "SELECT * REPLACE(CASE o_orderkey % 11 WHEN 4 THEN 'nan'::DOUBLE"
        " ELSE o_totalprice END AS o_totalprice) FROM {t}"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 10 = 4 THEN"
        "   list_transform(embedding, (x, i) ->"
        "     CASE WHEN i = 1 THEN 'nan'::FLOAT ELSE x END)"
        " WHEN vec_id % 10 = 7 THEN"
        "   list_transform(embedding, (x, i) ->"
        "     CASE WHEN i = 3 THEN 'inf'::FLOAT ELSE x END)"
        " ELSE embedding END AS embedding, label FROM {t}"
    ),
}


def _build_fixture(tag: str, rewrites: dict, src: str) -> str:
    """Materialize a rewritten fixture through the repo's own staging
    machinery (scratch_dir keys on the SOURCE content fingerprint +
    STAGING_VERSION + a digest of the rewrite recipe, so regenerated
    testdata or an edited recipe re-stages instead of serving stale
    bytes; ensure_staged commits a _SUCCESS marker LAST and the writer
    wipes first, so a crashed half-build is re-run, not trusted). Pure
    DuckDB — single-file parquet per table, the same layout as the
    real fixtures. Same no-concurrent-stagers caveat as every other
    staged corpus."""
    import hashlib
    import shutil

    from log2ck_spark.io import ensure_staged, scratch_dir

    if not os.path.isdir(src):
        raise FileNotFoundError(f"no testdata at {src}")
    recipe = hashlib.md5(repr(sorted(rewrites.items())).encode()).hexdigest()[:8]
    path = scratch_dir(src, tag, recipe)

    def _write(p: str) -> None:
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        con = duckdb.connect()
        for t in TABLES:
            sel = rewrites.get(t, "SELECT * FROM {t}")
            sql = sel.format(t=f"read_parquet('{os.path.join(src, t)}.parquet')")
            con.execute(
                f"COPY ({sql})"
                f" TO '{os.path.join(p, t)}.parquet' (FORMAT PARQUET)"
            )
        open(os.path.join(p, "_SUCCESS"), "w").close()

    return ensure_staged(path, _write)


def build_hostile_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The NULL-key fixture (see _HOSTILE_REWRITES)."""
    return _build_fixture("hostile_nullkeys", _HOSTILE_REWRITES, src)


def build_ties_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The duplicate-sort-key fixture (see _TIES_REWRITES)."""
    return _build_fixture("hostile_ties", _TIES_REWRITES, src)


def build_unicode_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The multibyte/multi-script text fixture (see _UNICODE_REWRITES)."""
    return _build_fixture("hostile_unicode", _UNICODE_REWRITES, src)


def build_bignum_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """Extreme-magnitude fixture (see _BIGNUM_REWRITES)."""
    return _build_fixture("hostile_bignum", _BIGNUM_REWRITES, src)


def build_badjson_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The malformed-props fixture (see _BADJSON_REWRITES)."""
    return _build_fixture("hostile_badjson", _BADJSON_REWRITES, src)


def build_timewarp_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The hostile-timestamp fixture (see _TIMEWARP_REWRITES)."""
    return _build_fixture("hostile_timewarp", _TIMEWARP_REWRITES, src)


def build_sparse_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The NULL-measure/payload fixture (see _SPARSE_REWRITES)."""
    return _build_fixture("hostile_sparse", _SPARSE_REWRITES, src)


def build_blank_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The empty/whitespace-string fixture (see _BLANK_REWRITES)."""
    return _build_fixture("hostile_blank", _BLANK_REWRITES, src)


def build_nonfinite_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The NaN/±Infinity measure fixture (see _NONFINITE_REWRITES)."""
    return _build_fixture("hostile_nonfinite", _NONFINITE_REWRITES, src)


def build_dupes_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The duplicate-heavy corpus fixture (see _DUPES_REWRITES)."""
    return _build_fixture("hostile_dupes", _DUPES_REWRITES, src)


def build_jumbo_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The outlier-sized documents/lines fixture (see _JUMBO_REWRITES)."""
    return _build_fixture("hostile_jumbo", _JUMBO_REWRITES, src)


def build_empty_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The zero-row fixture (see _EMPTY_REWRITES)."""
    return _build_fixture("hostile_empty", _EMPTY_REWRITES, src)


def build_single_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """The one-row-per-table fixture (see _SINGLE_REWRITES)."""
    return _build_fixture("hostile_single", _SINGLE_REWRITES, src)


def canonical(df_pandas):
    """Sort columns by name, normalize values for comparison."""
    pdf = df_pandas.copy()
    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    rows = sorted(tuple(norm(v) for v in row) for row in pdf.itertuples(index=False))
    return list(pdf.columns), rows


def driver_canon_check(pdf) -> str | None:
    """Replicate the DRIVER's canonicalizer, which sorts the pandas
    frame with sort_values over every column — pandas factorizes each
    column, and list/ndarray cells raise `TypeError: unhashable type`.
    Our own `canonical` stringifies arrays and is therefore MORE
    lenient; this check closes that gap so array-typed outputs are
    caught locally before the external harness sees them (the exact
    failure mode of embedding_normalize/quantize in round 3)."""
    try:
        pdf[sorted(pdf.columns)].sort_values(by=sorted(pdf.columns))
    except TypeError as exc:
        return f"driver-canon failure (unhashable output column?): {exc}"
    return None


def compare(spark_df, oracle_pdf) -> list[str]:
    """Returns list of mismatch descriptions (empty = pass)."""
    problems = []
    spark_pdf = spark_df.toPandas()
    driver_problem = driver_canon_check(spark_pdf)
    if driver_problem:
        problems.append(driver_problem)
    s_cols, s_rows = canonical(spark_pdf)
    o_cols, o_rows = canonical(oracle_pdf)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differ: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(f"first diff at sorted row {i}: spark={sr} oracle={orow}")
            break
    return problems
