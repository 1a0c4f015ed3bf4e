"""bench.py output-protocol guards — no Spark needed.

The r5 round lost its official headline number because everything was
serialized into ONE stdout line that outgrew the capture buffer; these
tests pin the protocol invariants that prevent a repeat: the baseline
reader prefers the SIDECAR record (since r9 the final stdout line
carries only the 27-name r3 subset, so a driver-parsed record would
silently narrow the headline tripwire to 27 of ~64 names; the sidecar
is rewritten with the FULL maps by every official run), falls back to
the newest PARSEABLE driver record, refuses cross-SF headline
comparisons, and the printed regressions map is bounded.
"""

from __future__ import annotations

import json

import bench


def _write(p, obj):
    p.write_text(json.dumps(obj))


def test_previous_bench_prefers_newest_parseable_driver_record(tmp_path):
    """With NO sidecar, the newest PARSEABLE driver record is the
    degraded fallback (r5's truncated null skipped)."""
    _write(
        tmp_path / "BENCH_r03.json",
        {"parsed": {"queries": {"q": 1.0}, "registry_sf001": {"r": 0.1}}},
    )
    _write(
        tmp_path / "BENCH_r04.json",
        {"parsed": {"queries": {"q": 2.0}, "sf": 0.1}},
    )
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})  # truncated round
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert src == "BENCH_r04.json"  # newest PARSEABLE, r5's null skipped
    assert head == {"q": 2.0}
    assert reg == {}  # no sidecar to merge from
    assert sf == 0.1


def test_previous_bench_sidecar_headline_wins_over_driver_record(tmp_path):
    """Since r9 the driver-parsed final line carries only the 27-name
    r3 subset; preferring it would silently narrow the headline
    regression tripwire to 27 of ~64 names. The sidecar is rewritten
    with the FULL queries map (and its own same-run calib) by every
    official run, so when it exists it IS the baseline."""
    _write(
        tmp_path / "BENCH_r06.json",
        {"parsed": {"queries": {"q": 2.0}, "sf": 0.1, "calib": 0.5}},
    )
    _write(
        tmp_path / "bench_registry.json",
        {
            "queries": {"q": 9.9, "not_in_r3_subset": 1.0},
            "registry_sf001": {"r": 0.2},
            "sf": 0.1,
            "calib": 0.7,
        },
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert head == {"q": 9.9, "not_in_r3_subset": 1.0}  # FULL map
    assert reg == {"r": 0.2}
    assert src == "bench_registry.json+BENCH_r06.json"
    assert cal == 0.7  # calib paired with the sidecar's own timings


def test_previous_bench_falls_back_to_sidecar(tmp_path):
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 3.0}, "registry_sf001": {"r": 0.2}, "sf": 0.1},
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert src == "bench_registry.json"
    assert (head, reg, sf) == ({"q": 3.0}, {"r": 0.2}, 0.1)


def test_previous_bench_tolerates_junk_and_absence(tmp_path):
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None, None, None)
    (tmp_path / "BENCH_r09.json").write_text("{not json")
    (tmp_path / "bench_registry.json").write_text("[]")  # not a dict
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None, None, None)
    # Valid JSON that is NOT an object (r6 advisor finding): must be
    # skipped like junk, not AttributeError before anything prints.
    (tmp_path / "BENCH_r10.json").write_text("[1, 2]")
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None, None, None)


def test_previous_bench_sidecar_registry_wins_over_driver_record(tmp_path):
    """An old-protocol driver record can embed a rounds-stale
    registry_sf001; the sidecar is rewritten by every official run, so
    when both exist the sidecar's maps win outright."""
    _write(
        tmp_path / "BENCH_r04.json",
        {
            "parsed": {
                "queries": {"q": 2.0},
                "registry_sf001": {"r": 9.9},  # stale old-protocol map
                "sf": 0.1,
            }
        },
    )
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 3.3}, "registry_sf001": {"r": 0.2}, "sf": 0.1},
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert head == {"q": 3.3}  # sidecar's full map is the baseline
    assert reg == {"r": 0.2}  # registry from the fresher sidecar
    assert src == "bench_registry.json+BENCH_r04.json"


def test_previous_bench_sidecar_registry_falls_back_to_driver(tmp_path):
    """A sidecar with a queries map but no registry map (hand-pruned
    or pre-r6) still wins the headline; the registry map falls back to
    the driver record's embedded copy rather than vanishing."""
    _write(
        tmp_path / "BENCH_r04.json",
        {
            "parsed": {
                "queries": {"q": 2.0},
                "registry_sf001": {"r": 9.9},
                "sf": 0.1,
            }
        },
    )
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 3.3}, "sf": 0.1},
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert head == {"q": 3.3}
    assert reg == {"r": 9.9}
    assert src == "bench_registry.json+BENCH_r04.json"


def test_detect_regressions_divides_out_uniform_drift():
    """r6's measured failure mode: a uniform 1.25x sandbox slowdown.
    Under the raw 2x test a real 1.6x code regression hides inside it;
    median normalization must surface exactly the regressed query."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {n: 2.5 for n in prev}  # everything uniformly 2.5x slower
    reg, drift, src = bench.detect_regressions([(cur, prev, "registry")])
    assert drift == 2.5
    assert reg == {}  # raw test would have flagged all 10
    cur["q3"] = 6.0  # 6x raw = 2.4x normalized: a real regression
    reg, drift, src = bench.detect_regressions([(cur, prev, "registry")])
    assert drift == 2.5
    assert set(reg) == {"q3"}
    assert reg["q3"]["norm"] == 2.4 and reg["q3"]["set"] == "registry"


def test_detect_regressions_fast_machine_does_not_loosen_bar():
    """On a 2x FASTER machine the raw test needs 4x to trip; the
    normalized test still trips at 2x of the machine-adjusted time."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {n: 0.5 for n in prev}
    cur["q7"] = 1.4  # only 1.4x raw, but 2.8x vs the 0.5 drift
    reg, drift, src = bench.detect_regressions([(cur, prev, "registry")])
    assert drift == 0.5
    assert set(reg) == {"q7"}


def test_detect_regressions_few_pairs_skip_normalization():
    """With fewer pairs than _ENV_DRIFT_MIN_PAIRS the median IS the
    judged queries — fall back to raw ratios (drift 1.0) and keep the
    absolute >0.25 s floor."""
    reg, drift, src = bench.detect_regressions(
        [({"a": 3.0, "b": 0.3}, {"a": 1.0, "b": 0.1}, "headline")]
    )
    assert drift == 1.0
    assert set(reg) == {"a"}  # b is 3x but only +0.2 s: noise floor


def test_detect_regressions_calib_disambiguates_uniform_real_regression():
    """The median alone cannot tell a uniform machine slowdown from a
    uniform REAL regression (a session-config change slowing every
    query 2.5x moves the median to 2.5 and reports nothing). With a
    calib anchor saying the machine is unchanged (~1.0), normalization
    must fall back to the calib ratio and flag the queries."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {n: 2.5 for n in prev}
    reg, drift, src = bench.detect_regressions(
        [(cur, prev, "registry")], calib_ratio=1.02
    )
    assert src == "calib" and drift == 1.02
    assert set(reg) == set(prev)  # the uniform regression surfaces
    # And when calib AGREES with the median (true machine slowdown),
    # the median stays authoritative and nothing is flagged.
    reg, drift, src = bench.detect_regressions(
        [(cur, prev, "registry")], calib_ratio=2.4
    )
    assert src == "median" and drift == 2.5
    assert reg == {}


def test_detect_regressions_noisy_high_calib_never_loosens():
    """The fallback is asymmetric: a calib ratio ABOVE the median by
    >1.4x (a noisy anchor reading slow — observed r8: calib 1.68 vs
    median 1.1 over 100+ pairs) must NOT replace the median, or the
    effective tripwire loosens to ~3.4x raw for every query. The
    median stays authoritative and the divergence is surfaced in
    drift_source."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = dict({n: 1.1 for n in prev}, bad=3.2)
    prev["bad"] = 1.0
    reg, drift, src = bench.detect_regressions(
        [(cur, prev, "registry")], calib_ratio=1.7
    )
    assert src == "median_calib_divergent" and drift == 1.1
    # bad is 3.2/1.1 = 2.9x normalized: flagged under the median,
    # would have been hidden (3.2/1.7 = 1.9x) under the noisy calib.
    assert set(reg) == {"bad"}


def test_detect_regressions_low_calib_flat_median_no_storm():
    """A calib ratio far BELOW a flat median (noisy-high BASELINE
    anchor — r8 observed ratio 0.383 against a 1.0 median) must not
    trigger the fallback: with no uniform slowdown to explain,
    normalizing flat queries by 0.383 would flag every one of them
    (63 false regressions in one observed run). The fallback needs
    BOTH median/calib > 1.4 AND median > 1.15 (above ambient median
    jitter — a flat median has no slowdown for the anchor to
    adjudicate)."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {n: 1.0 for n in prev}
    reg, drift, src = bench.detect_regressions(
        [(cur, prev, "registry")], calib_ratio=0.383
    )
    assert src == "median_calib_divergent" and drift == 1.0
    assert reg == {}


def test_detect_regressions_uniform_regression_on_faster_machine():
    """A uniform REAL regression does not get to hide behind a machine
    speedup: code slows every query 2.5x while the host gets 2x faster
    (calib_ratio 0.5), so the median reads a mild-looking 1.25 — below
    the old 1.3 uniform-slowdown gate, which silently normalized every
    pair by its own contamination and reported zero regressions. Any
    median above ambient jitter (1.15) with a calib the machine cannot
    explain must fall back to the calib ratio and flag the queries."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    cur = {n: 1.25 for n in prev}
    reg, drift, src = bench.detect_regressions(
        [(cur, prev, "registry")], calib_ratio=0.5
    )
    assert src == "calib" and drift == 0.5
    assert set(reg) == set(prev)  # 1.25/0.5 = 2.5x normalized, all trip


def test_previous_bench_never_borrows_calib_across_records(tmp_path):
    """The baseline calib must pair with the SAME record's timings —
    a calib ratioed against another run's timings would mis-normalize
    every headline pair at once. Under the sidecar-wins rule this
    means: sidecar timings ship with the sidecar's own calib (never
    the driver record's), and a driver-record fallback without a calib
    key yields cal=None (median-only, the safe degraded mode) even if
    a calib exists elsewhere."""
    _write(
        tmp_path / "BENCH_r06.json",
        {"parsed": {"queries": {"q": 2.0}, "sf": 0.1, "calib": 0.9}},
    )
    _write(
        tmp_path / "bench_registry.json",
        {
            "queries": {"q": 9.9},
            "registry_sf001": {"r": 0.2},
            "sf": 0.1,
            "calib": 0.15,
        },
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert head == {"q": 9.9} and reg == {"r": 0.2}
    assert cal == 0.15  # the sidecar's OWN anchor, not the driver's 0.9
    # Sidecar without a calib: cal=None, never borrowed from the
    # driver record sitting next to it.
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 9.9}, "registry_sf001": {"r": 0.2}, "sf": 0.1},
    )
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert head == {"q": 9.9} and cal is None
    # Driver-record fallback (no sidecar at all) keeps its OWN calib.
    (tmp_path / "bench_registry.json").unlink()
    head, reg, src, sf, cal = bench._previous_bench(str(tmp_path))
    assert src == "BENCH_r06.json" and head == {"q": 2.0} and cal == 0.9


def test_final_line_json_does_not_mutate_caller_dict():
    """The same dict feeds the sidecar dump; the shedding loop must
    work on a copy or an over-budget line would silently strip keys
    from the official sidecar record."""
    line = _worst_case_headline_line()
    line["queries"] = {f"q{i}": 999.999 for i in range(500)}
    before = json.dumps(line)
    bench.final_line_json(line)
    assert json.dumps(line) == before


def test_detect_regressions_floor_is_drift_adjusted():
    """The >0.25 s absolute floor must apply to the drift-adjusted
    delta t - drift*prev: on a 2x-faster machine a real 3x normalized
    regression (0.4s -> 0.6s) has raw delta 0.2 and would be
    suppressed by a raw-delta floor."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    prev["qx"] = 0.4
    cur = {n: 0.5 for n in prev}
    cur["qx"] = 0.6  # raw delta 0.2 < 0.25, but drift-adjusted 0.4
    reg, drift, src = bench.detect_regressions([(cur, prev, "registry")])
    assert drift == 0.5
    assert "qx" in reg and reg["qx"]["norm"] == 3.0


def test_bench_smoke_executes_main_path():
    """The r7 lesson: no JSON-fixture test can catch a Spark statement
    on bench.py's main path that throws under the repo's own ANSI-on
    session (the calib anchor overflowed and zeroed the round's entire
    artifact, committed without ever being executed). --smoke runs the
    REAL main path — calib, measure loop, regression detection, 2-line
    print — at sf0.001 and must exit 0 with a parseable final line
    carrying a non-null calib. SPARK_GRAFT_SF_DIR is exported to the
    OFFICIAL scale here on purpose: smoke must pin sf0.001 regardless
    (an operator who exported it for an official run would otherwise
    turn the <60 s pre-commit gate into a full-SF run — and this test,
    which inherits os.environ, into a spurious red)."""
    import os as _os
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, bench.__file__, "--smoke"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=bench._REPO_ROOT,
        env={**_os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["smoke"] is True and rec["sf"] == 0.001
    assert isinstance(rec["calib"], float) and rec["calib"] > 0
    assert len(rec["queries"]) == 3 and all(
        v > 0 for v in rec["queries"].values()
    )
    # The streaming-ingest throughput probe must have actually run:
    # it is advisory (null on failure can't kill the artifact), but a
    # SMOKE run failing it means the production ingest path is broken.
    assert rec["ingest"] is not None
    assert rec["ingest"]["rows"] > 0 and rec["ingest"]["rows_per_sec"] > 0


def test_repo_sidecar_is_current_and_parseable():
    """The committed sidecar must parse and carry both maps — it is
    next round's fallback baseline if the driver capture truncates,
    and the standing registry baseline either way."""
    head, reg, src, sf, cal = bench._previous_bench()
    assert src is not None
    assert head  # some baseline always exists in this checkout
    side = bench._read_sidecar(bench._REPO_ROOT)
    assert side and side.get("registry_sf001") and side.get("sf") == 0.1


def _worst_case_headline_line() -> dict:
    """The final line exactly as main() builds it, every key present
    and every value at its widest plausible serialization: the full
    27-name r3-subset queries map, the regressions map at its print
    cap in the compact {name: norm} shape, a long baseline source
    string, and a populated ingest record."""
    return {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "r3_subset_total": 99999.999,
        "queries": {n: 999.999 for n in bench.HEADLINE[:27]},
        "regressions": {
            n: 999.99
            for n in bench.HEADLINE[: bench._REGRESSIONS_PRINT_CAP]
        },
        "regr_isolated": {
            n: 999.99
            for n in bench.HEADLINE[: bench._REGRESSIONS_PRINT_CAP]
        },
        "regressions_total": 175,
        "regressions_baseline": "BENCH_r08.json+bench_registry.json",
        "env_drift": 99.999,
        "drift_source": "median_calib_divergent",
        "calib": 999.999,
        "calib_ratio": 99.999,
        "ingest": {
            "rows_per_sec": 9999999.9,
            "rows": 99999999,
            "wall_s": 9999.999,
            "batches": 99999,
        },
        "sf": 0.1,
    }


def test_headline_line_fits_the_driver_tail_window():
    """The driver keeps the LAST 2000 BYTES of stdout; the final line
    must parse from inside that window. r8's line hit 2119 bytes and
    the round's official bench artifact recorded `parsed: null` —
    the third dead artifact in four rounds. This asserts the REAL
    production shape (27-name queries subset + capped compact
    regressions + every optional key populated) against the REAL
    budget, not a smoke-shaped line against a 2x-too-loose bound
    (the r6 guard bounded at 4096 and let r8 die)."""
    line = bench.final_line_json(_worst_case_headline_line())
    assert len(line) <= bench._FINAL_LINE_BUDGET, len(line)
    assert bench._FINAL_LINE_BUDGET <= 1800
    # and it must round-trip as JSON with the driver-required keys
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert "queries" in parsed and "sf" in parsed and "unit" in parsed


def test_final_line_json_sheds_bulk_before_dying():
    """Even a pathologically bloated line (a future key that dwarfs
    the budget) must emit parseable JSON under budget by shedding the
    sidecar-duplicated bulk keys — the artifact can never again be
    killed by line growth."""
    line = _worst_case_headline_line()
    line["queries"] = {f"q{i}": 999.999 for i in range(500)}  # ~9 KB
    s = bench.final_line_json(line)
    assert len(s) <= bench._FINAL_LINE_BUDGET, len(s)
    parsed = json.loads(s)
    # scalars that identify the run survive every shed step
    assert parsed["value"] == 99999.999
    assert parsed["sf"] == 0.1
    assert parsed["metric"] == "headline_queries_total"


def test_final_line_json_minimal_fallback_when_scalars_bloat():
    """r10 ADVICE fix: if a future long SCALAR (not one of the four
    sheddable bulk keys) blows the budget, the fallback emits the
    minimal fixed-key line instead of silently returning an
    over-budget string — the dead-artifact failure mode the budget
    guard exists to prevent."""
    line = _worst_case_headline_line()
    line["regressions_baseline"] = "x" * 5000  # unsheddable scalar
    s = bench.final_line_json(line)
    assert len(s) <= bench._FINAL_LINE_BUDGET, len(s)
    parsed = json.loads(s)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 99999.999
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1


def test_r3_subset_is_exactly_the_r3_bench_set():
    """r3_subset_total is the cross-round apples-to-apples number; its
    definition is 'the 27 names BENCH_r03 timed'. If someone reorders
    or edits the head of HEADLINE the metric silently changes meaning
    — pin the prefix to the recorded r3 set."""
    with open(bench._REPO_ROOT + "/BENCH_r03.json") as f:
        r3 = json.load(f)["parsed"]["queries"]
    assert bench.HEADLINE[: len(r3)] == list(r3)


def test_genesis_seeded_from_committed_sidecar_and_carried(tmp_path):
    """First call on an old-format sidecar (no genesis key) must seed
    genesis from THAT sidecar's committed numbers (the r12 registry),
    and a later call on a new-format sidecar must carry the stored
    genesis VERBATIM — never re-derive from the fresher overwrite."""
    import json

    import bench

    old = tmp_path / "reg.json"
    old.write_text(json.dumps({
        "calib": 0.2, "sf": 0.1,
        "queries": {"q1": 1.0, "q2": 2.0},
    }))
    g, drift, med = bench.genesis_and_drift(
        str(old), {"q1": 1.5, "q2": 2.0}, calib=0.3, sf_val=0.1
    )
    assert g["round"] == "r12" and g["queries"] == {"q1": 1.0, "q2": 2.0}
    # chain = 0.3/0.2 = 1.5x slower machine; q1 raw 1.5x -> norm 1.0,
    # q2 raw 1.0x -> norm 0.667
    assert drift == {"q1": 1.0, "q2": 0.667}
    assert med == 1.0

    # new-format sidecar: stored genesis wins over the record's own
    # (newer, drifted) queries map
    new = tmp_path / "reg2.json"
    new.write_text(json.dumps({
        "calib": 0.3, "sf": 0.1,
        "queries": {"q1": 9.9},
        "genesis": g,
    }))
    g2, drift2, _ = bench.genesis_and_drift(
        str(new), {"q1": 1.0}, calib=0.2, sf_val=0.1
    )
    assert g2 == g
    assert drift2 == {"q1": 1.0}


def test_genesis_sf_mismatch_and_virgin_checkout(tmp_path):
    """A smoke-scale run must not produce cross-scale drift numbers;
    a missing sidecar seeds genesis from the current run."""
    import bench

    missing = tmp_path / "nope.json"
    g, drift, med = bench.genesis_and_drift(
        str(missing), {"q1": 1.0}, calib=0.1, sf_val=0.1
    )
    assert g["round"] == "seed" and g["queries"] == {"q1": 1.0}
    assert drift == {"q1": 1.0} and med == 1.0

    g2, drift2, med2 = bench.genesis_and_drift(
        str(missing), {"q1": 1.0}, calib=0.1, sf_val=0.001
    )
    assert g2["sf"] == 0.001  # seeded at this run's scale
    # but reading an sf0.1 genesis at sf0.001 yields NO drift rows
    import json
    sc = tmp_path / "reg3.json"
    sc.write_text(json.dumps({
        "calib": 0.2, "sf": 0.1, "queries": {"q1": 1.0},
    }))
    _, drift3, med3 = bench.genesis_and_drift(
        str(sc), {"q1": 5.0}, calib=0.2, sf_val=0.001
    )
    assert drift3 == {} and med3 is None


def test_final_line_sheds_cum_drift_worst_before_regressions():
    import json

    import bench

    line = {
        "metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1,
        "queries": {f"q{i}": 1.0 for i in range(40)},
        "regressions": {f"r{i}": 2.0 for i in range(30)},
        "cum_drift_worst": {f"c{i:03d}" * 20: 9.9 for i in range(20)},
        "regr_isolated": {},
    }
    out = bench.final_line_json(line)
    assert len(out) <= bench._FINAL_LINE_BUDGET
    parsed = json.loads(out)
    assert "cum_drift_worst" not in parsed
    # the caller's dict is untouched (it feeds the sidecar)
    assert "cum_drift_worst" in line


def test_genesis_registry_map_widens_drift_to_all_names(tmp_path):
    """genesis carries BOTH maps: headline (sf-gated) and the sf0.01
    registry sweep (always comparable), so cum_drift covers the whole
    query surface, not just the 63 headliners; pre-registry genesis
    records migrate in place from the sidecar's own sweep."""
    import json

    import bench

    sc = tmp_path / "reg.json"
    sc.write_text(json.dumps({
        "calib": 0.2, "sf": 0.1,
        "queries": {"h1": 1.0},
        "registry_sf001": {"r1": 0.5, "r2": 0.5},
        "genesis": {  # pre-registry format
            "round": "r12", "calib": 0.2, "sf": 0.1,
            "queries": {"h1": 1.0},
        },
    }))
    g, drift, med = bench.genesis_and_drift(
        str(sc), {"h1": 1.0}, calib=0.2, sf_val=0.1,
        registry={"r1": 1.0, "r2": 0.5},
    )
    assert g["registry"] == {"r1": 0.5, "r2": 0.5}  # migrated
    assert drift == {"h1": 1.0, "r1": 2.0, "r2": 1.0}
    assert med == 1.0


def test_material_cum_drift_floors_subsecond_noise():
    """A 0.06 s query reading 5x is measurement noise — the worst-N
    display applies the tripwire's 0.25 s chain-adjusted floor; a
    genuinely material mover survives."""
    import bench

    genesis = {
        "calib": 0.2, "sf": 0.1,
        "queries": {}, "registry": {"tiny": 0.06, "big": 1.0},
    }
    cum = {"tiny": 5.0, "big": 2.0}
    got = bench.material_cum_drift(
        genesis, cum, {}, {"tiny": 0.30, "big": 2.0}, calib=0.2,
    )
    assert got == {"big": 2.0}


def test_material_cum_drift_gates_headline_maps_on_sf():
    """On a non-official-scale run (sf != genesis sf) the headline
    timing maps must NOT merge over the always-sf0.01 registry values:
    a small-sf headline timing under a big-sf genesis value makes the
    materiality delta negative and spuriously empties the worst set.
    Registry-vs-registry comparisons stay in; the -1.0 failed-sweep
    sentinel is excluded rather than producing a nonsense ratio."""
    import bench

    genesis = {
        "calib": 0.2, "sf": 0.1,
        # h1 is a headline name: genesis recorded it at sf0.1 (4.0 s)
        "queries": {"h1": 4.0},
        "registry": {"h1": 0.4, "r1": 1.0, "bad": 0.5},
    }
    cum = {"h1": 3.0, "r1": 2.0, "bad": 4.0}
    # this run is sf0.01: headline h1 ran in 1.2 s (vs registry 0.4 —
    # material), but vs the sf0.1 genesis headline 4.0 the delta
    # would be negative and h1 would vanish; "bad" failed the sweep
    timings = {"h1": 1.2}
    registry = {"h1": 1.2, "r1": 2.5, "bad": -1.0}
    got = bench.material_cum_drift(
        genesis, cum, timings, registry, calib=0.2, sf_val=0.01,
    )
    assert got == {"h1": 3.0, "r1": 2.0}  # sentinel "bad" excluded
    # at the OFFICIAL scale the headline maps participate again
    got_official = bench.material_cum_drift(
        genesis, cum, {"h1": 9.0}, {"r1": 2.5, "bad": -1.0},
        calib=0.2, sf_val=0.1,
    )
    assert "h1" in got_official and "bad" not in got_official
