"""bench.py output-protocol guards — no Spark needed.

The r5 round lost its official headline number because everything was
serialized into ONE stdout line that outgrew the capture buffer; these
tests pin the protocol invariants that prevent a repeat: the baseline
reader prefers the newest PARSEABLE driver record, falls back to the
sidecar, and never raises on junk.
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
    _write(tmp_path / "BENCH_r04.json", {"parsed": {"queries": {"q": 2.0}}})
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})  # truncated round
    head, reg, src = bench._previous_bench(str(tmp_path))
    assert src == "BENCH_r04.json"  # newest PARSEABLE, r5's null skipped
    assert head == {"q": 2.0}
    assert reg == {}  # r4 predates the registry sweep


def test_previous_bench_falls_back_to_sidecar(tmp_path):
    _write(tmp_path / "BENCH_r05.json", {"parsed": None})
    _write(
        tmp_path / "bench_registry.json",
        {"queries": {"q": 3.0}, "registry_sf001": {"r": 0.2}},
    )
    head, reg, src = bench._previous_bench(str(tmp_path))
    assert src == "bench_registry.json"
    assert (head, reg) == ({"q": 3.0}, {"r": 0.2})


def test_previous_bench_tolerates_junk_and_absence(tmp_path):
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None)
    (tmp_path / "BENCH_r09.json").write_text("{not json")
    assert bench._previous_bench(str(tmp_path)) == ({}, {}, None)


def test_repo_sidecar_is_current_and_parseable():
    """The committed sidecar must parse and carry both maps — it is
    next round's fallback baseline if the driver capture truncates."""
    head, reg, src = bench._previous_bench()
    assert src is not None
    assert head  # some baseline always exists in this checkout


def test_headline_line_stays_tail_buffer_sized():
    """The final stdout line must stay far under typical tail-capture
    buffers even with every headline query present: estimate its size
    from the real HEADLINE list with worst-case 8-char timings."""
    fake = {n: 999.999 for n in bench.HEADLINE}
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 9999.999,
            "unit": "sec",
            "r3_subset_total": 9999.999,
            "queries": fake,
            "regressions": {},
            "regressions_baseline": "BENCH_r04.json",
            "sf": 0.1,
        }
    )
    assert len(line) < 4096, len(line)
