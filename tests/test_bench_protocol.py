"""bench.py output-protocol guards — no Spark needed.

The r5 round lost its official headline number because everything was
serialized into ONE stdout line that outgrew the capture buffer; these
tests pin the protocol invariants that prevent a repeat: the baseline
reader prefers the newest PARSEABLE driver record, merges the registry
map from the sidecar (driver records never carry it under this
protocol), refuses cross-SF headline comparisons, and the printed
regressions map is bounded.
"""

from __future__ import annotations

import json

import bench


def _write(p, obj):
    p.write_text(json.dumps(obj))


def test_previous_bench_prefers_newest_parseable_driver_record(tmp_path):
    _write(
        tmp_path / "BENCH_r03.json",
        {"parsed": {"queries": {"q": 1.0}, "registry_sf001": {"r": 0.1}}},
    )
    _write(
        tmp_path / "BENCH_r04.json",
        {"parsed": {"queries": {"q": 2.0}, "sf": 0.1}},
    )
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})  # truncated round
    head, reg, src, sf = bench._previous_bench(str(tmp_path))
    assert src == "BENCH_r04.json"  # newest PARSEABLE, r5's null skipped
    assert head == {"q": 2.0}
    assert reg == {}  # no sidecar to merge from
    assert sf == 0.1


def test_previous_bench_merges_registry_from_sidecar(tmp_path):
    """Driver-parsed final lines deliberately do NOT carry
    registry_sf001 (it prints on its own earlier line), so without the
    sidecar merge the ~106 registry-only queries would be permanently
    baseline-less for the tripwire."""
    _write(
        tmp_path / "BENCH_r06.json",
        {"parsed": {"queries": {"q": 2.0}, "sf": 0.1}},
    )
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 9.9}, "registry_sf001": {"r": 0.2}, "sf": 0.1},
    )
    head, reg, src, sf = bench._previous_bench(str(tmp_path))
    assert head == {"q": 2.0}  # headline from the DRIVER record
    assert reg == {"r": 0.2}  # registry merged from the sidecar
    assert src == "BENCH_r06.json+sidecar"


def test_previous_bench_falls_back_to_sidecar(tmp_path):
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 3.0}, "registry_sf001": {"r": 0.2}, "sf": 0.1},
    )
    head, reg, src, sf = bench._previous_bench(str(tmp_path))
    assert src == "bench_registry.json"
    assert (head, reg, sf) == ({"q": 3.0}, {"r": 0.2}, 0.1)


def test_previous_bench_tolerates_junk_and_absence(tmp_path):
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None, None)
    (tmp_path / "BENCH_r09.json").write_text("{not json")
    (tmp_path / "bench_registry.json").write_text("[]")  # not a dict
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None, None)


def test_repo_sidecar_is_current_and_parseable():
    """The committed sidecar must parse and carry both maps — it is
    next round's fallback baseline if the driver capture truncates,
    and the standing registry baseline either way."""
    head, reg, src, sf = bench._previous_bench()
    assert src is not None
    assert head  # some baseline always exists in this checkout
    side = bench._read_sidecar(bench._REPO_ROOT)
    assert side and side.get("registry_sf001") and side.get("sf") == 0.1


def test_headline_line_stays_tail_buffer_sized_even_under_mass_regression():
    """The final stdout line must stay far under typical tail-capture
    buffers even with every headline query present AND the regressions
    map at its print cap (a slow machine can trip >2x on everything vs
    a committed fast-box baseline — the exact shape that truncated
    r5's capture)."""
    fake = {n: 999.999 for n in bench.HEADLINE}
    capped = {
        n: {"now": 999.999, "prev": 499.999, "set": "headline"}
        for n in bench.HEADLINE[: bench._REGRESSIONS_PRINT_CAP]
    }
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 9999.999,
            "unit": "sec",
            "r3_subset_total": 9999.999,
            "queries": fake,
            "regressions": capped,
            "regressions_total": 175,
            "regressions_baseline": "BENCH_r06.json+sidecar",
            "sf": 0.1,
        }
    )
    assert len(line) < 4096, len(line)


def test_r3_subset_is_exactly_the_r3_bench_set():
    """r3_subset_total is the cross-round apples-to-apples number; its
    definition is 'the 27 names BENCH_r03 timed'. If someone reorders
    or edits the head of HEADLINE the metric silently changes meaning
    — pin the prefix to the recorded r3 set."""
    with open(bench._REPO_ROOT + "/BENCH_r03.json") as f:
        r3 = json.load(f)["parsed"]["queries"]
    assert bench.HEADLINE[: len(r3)] == list(r3)
