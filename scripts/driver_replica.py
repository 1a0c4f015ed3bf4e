"""Drive the public contract exactly as the round driver does:
import __spark_entry__ from a fresh process, smoke entry() at sf0.001,
then run every queries()[name] at sf0.01 and compare against
oracle_sql()[name] via DuckDB (row count + columns + order-insensitive
values). Usage: python scripts/driver_replica.py [sf_dir] [name ...]
— optional query names restrict the run to just those (fast re-check
of the queries an edit touched; the full no-args run remains the
pre-commit gate for broad changes).

`--sf 0.1` (or any SF with a /root/testdata/sf{SF} dir) is shorthand
for the corresponding sf_dir: `python scripts/driver_replica.py --sf
0.1` is the REPEATABLE 10x-scale full-registry value gate — the same
oracle comparison the driver runs at sf0.01, at ten times the data
(r6/r7 verdicts asked for this as one documented command; see
PARITY.md). Expect ~3-4x the sf0.01 wall time.

`--hostile` runs the same full-registry comparison on the NULL-key
fixture (sf0.001 with NULLs injected into every GROUP-BY-able key
column; built on demand under .scratch/) — the dirty-data parity
gate. Real data has NULL keys and the driver's fixtures don't, so a
query and its oracle can disagree on NULL-key semantics invisibly;
this surfaced 10 such divergences in r8. See tests/oracle_harness.py.

`--ties` is the same gate on the duplicate-sort-key fixture (events
timestamps collapsed onto a 6-hour grid, quantized values/prices,
duplicate document texts and embedding vectors) — any query/oracle
pair whose output depends on tie order without a shared total
tiebreak diverges here (the r8 stream_session_window defect class).

`--unicode` is the same gate on the multibyte/multi-script fixture
(CJK, ZWJ emoji, NFC+NFD accents, RTL document texts; a multibyte
event_type value) — where Java-regex/UTF8String and DuckDB string
semantics can diverge on \\w classes, casing, and codepoint counts.

`--badjson` is the same gate on the malformed-props fixture
(truncated JSON, non-JSON debris, empty strings, wrong-typed values,
array roots) — where DuckDB's json_extract_string raises on input
Spark's get_json_object NULLs, and ANSI CAST crashes where the
intent is NULL.

`--bignum` is the same gate on the extreme-magnitude fixture (values
at and past the decimal(18,6) |x| < 1e12 exact-aggregate domain bound
in every summed double column) — the end-to-end proof of the r10
decimal → TRY_CAST migration: out-of-range values must NULL-skip
identically on both engines instead of raising under ANSI.

`--timewarp` is the same gate on the hostile-timestamp fixture
(pre-1970 fractional epochs where floor != truncate, epoch 0,
far-future microsecond edges where DuckDB's DOUBLE epoch() loses the
fractional second, leap-day and exact-bucket-boundary instants,
century-scale gaps; pre-1970/far-future dates in orders/lineitem) —
where second-granularity bucketing, window membership, and
epoch-conversion precision can diverge between engines.

`--sparse` is the same gate on the NULL-measure/payload fixture
(NULL events.value/props, NULL document text (+n_chars), NULL
embedding vectors, NULL TPC-H money columns) — the complement of
--hostile's NULL keys: COUNT(*) vs COUNT(col), AVG denominators,
NULL propagation through arithmetic, all-NULL groups, and Arrow/UDF
paths that assume a non-null string or array.

`--blank` is the same gate on the empty/whitespace-string fixture
(empty and whitespace-only document texts with n_chars recomputed,
'' and '  ' event_type group keys, '' lang) — the class between
present and NULL: ratio arithmetic over zero lengths (ANSI division
by zero), tokenizers of '', zero-shingle docs, and empty-string
group keys next to NULL ones.

`--nonfinite` is the same gate on the NaN/±Infinity measure fixture
(~13% of events.value, two lineitem stripes, one orders stripe,
NaN/inf COMPONENTS inside embedding vectors) — where DuckDB's direct
TRY_CAST(nan AS DECIMAL) and STDDEV-over-inf RAISE while Spark
NULL-skips / returns NaN, quantile interpolation meets NaN-sorts-last,
ANSI bucket casts of floor(inf/w) die, and every Arrow vector kernel
sees non-finite norms.

`--dupes` is the same gate on the duplicate-heavy corpus fixture
(40% of documents ONE text + a near-dup satellite + a token-permuted
class, 40%/14% duplicate embedding vectors, 25% of events collapsed
onto one constant non-key row) — the web-crawl shape where the dedup/
cluster/sketch family does its real work; duplicate classes sized
under BUCKET_CAP so capped pair expansion stays exactly the full
expansion and all-pairs oracles remain comparable.

`--empty` is the same gate on the ZERO-ROW fixture (every table
present with its full schema and no rows — the day-one deployment
state) — where driver-side parameter derivation (.first() on an
empty corpus) crashes and degenerate global aggregates can emit
one row on one engine and none on the other.

`--single` is the same gate on the ONE-ROW-PER-TABLE fixture
(lowest primary key kept) — where n=1 sample statistics
(stddev_samp NULL-vs-NaN), one-observation percentile/histogram
interpolation, and single-point window/EWMA kernels diverge.

`--jumbo` is the same gate on the outlier-sized fixture (a ~180 KB
doc of 20k distinct words, a single unbroken ~99 KB token, 'spam' ×
30,000, and a 50 KB props value rendered into a 50 KB monolog line)
— where tokenizer/shingle arrays hit 20k elements, regexes walk
100 KB values, repetition ratios max out, and the parse grammars
must extract from mega-lines identically on both engines.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from log2ck_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, run_oracle  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    if argv[:1] in (
        ["--hostile"], ["--ties"], ["--unicode"], ["--badjson"],
        ["--bignum"], ["--timewarp"], ["--sparse"], ["--blank"],
        ["--nonfinite"], ["--dupes"], ["--jumbo"], ["--empty"],
        ["--single"],
    ):
        from tests import oracle_harness as oh

        build = {
            "--hostile": oh.build_hostile_fixture,
            "--ties": oh.build_ties_fixture,
            "--unicode": oh.build_unicode_fixture,
            "--badjson": oh.build_badjson_fixture,
            "--bignum": oh.build_bignum_fixture,
            "--timewarp": oh.build_timewarp_fixture,
            "--sparse": oh.build_sparse_fixture,
            "--blank": oh.build_blank_fixture,
            "--nonfinite": oh.build_nonfinite_fixture,
            "--dupes": oh.build_dupes_fixture,
            "--jumbo": oh.build_jumbo_fixture,
            "--empty": oh.build_empty_fixture,
            "--single": oh.build_single_fixture,
        }[argv[0]]
        try:
            sf_dir, rest = build(), argv[1:]
        except FileNotFoundError as e:
            print(e)
            return 1
    elif argv[:1] == ["--sf"]:
        if len(argv) < 2:
            print("--sf requires a scale factor (e.g. --sf 0.1)")
            return 1
        sf_dir, rest = f"/root/testdata/sf{argv[1]}", argv[2:]
        if not os.path.isdir(sf_dir):
            print(f"no testdata at {sf_dir}")
            return 1
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        rest = argv[1:]
    only = set(rest)
    spark = get_spark("driver-replica")

    t0 = time.time()
    smoke = contract.entry(spark)
    rows = smoke.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in smoke.schema]} "
          f"({time.time()-t0:.1f}s)")
    assert len(rows) >= 0

    queries = contract.queries()
    oracles = contract.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        queries = {n: q for n, q in queries.items() if n in only}
    print(f"{len(queries)} queries, {len(set(queries) & set(oracles))} with oracles")
    n_fail = 0
    for name in sorted(queries):
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                problems = compare(df, run_oracle(oracles[name], sf_dir))
                status = "OK " if not problems else "FAIL"
                detail = "; ".join(problems)
            else:
                n = df.count()
                status, detail = "OK*", f"rows-only n={n}"
        except Exception as e:  # noqa: BLE001
            status, detail = "ERR", f"{type(e).__name__}: {e}"
        dt = time.time() - t0
        if status not in ("OK ", "OK*"):
            n_fail += 1
        print(f"  [{status}] {name:28s} {dt:6.1f}s  {detail[:200]}")
    print("RESULT:", "PASS" if n_fail == 0 else f"FAIL ({n_fail})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
