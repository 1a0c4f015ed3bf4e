"""Config file loading + the `python -m log2ck_spark` runtime."""

from __future__ import annotations

import json

import pytest

from log2ck_spark.config import EngineConfig, load_config


def _write_json_config(tmp_path, logs, table, ckpt):
    cfg = {
        "tails": [
            {
                "name": "t1",
                "path": str(logs / "*.log"),
                "repo": "r1",
                "follow": False,
            }
        ],
        "sink": {"path": str(table)},
        "checkpoint_root": str(ckpt),
        "trigger_seconds": 1,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return p


def test_load_config_json_roundtrip(tmp_path):
    p = _write_json_config(tmp_path, tmp_path / "logs", tmp_path / "t", tmp_path / "c")
    cfg = load_config(str(p))
    assert isinstance(cfg, EngineConfig)
    assert cfg.tails[0].name == "t1" and cfg.tails[0].repo == "r1"
    assert cfg.trigger_seconds == 1


def test_host_defaults_to_gethostname(tmp_path):
    """Reference parity (Worker.php:148): the host enrichment defaults
    to gethostname(), not a 'localhost' literal — a drop-in config
    with no host key must stamp the real machine name. Explicit host
    still wins."""
    import socket

    from log2ck_spark.config import TailSpec
    from log2ck_spark.parse import enrich

    assert TailSpec(name="t", path="/x").host == socket.gethostname()
    assert TailSpec(name="t", path="/x", host="h9").host == "h9"
    assert enrich.__defaults__ == (None,)  # column-level default: resolved lazily


def test_load_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"tails": [{"name": "x", "path": "/y", "oops": 1}]}))
    with pytest.raises(ValueError, match="unknown tail keys"):
        load_config(str(p))
    p2 = tmp_path / "bad2.json"
    p2.write_text(json.dumps({"tailz": []}))
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(str(p2))


def test_load_config_python_with_callback(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "from pyspark.sql import functions as F\n"
        "from log2ck_spark.config import EngineConfig, SinkConfig, TailSpec\n"
        "CONFIG = EngineConfig(\n"
        "    tails=[TailSpec(name='t', path='/tmp/x*.log',\n"
        "                    callback=lambda df: df.withColumn('extra_col', F.lit(1)))],\n"
        "    sink=SinkConfig(path='/tmp/out'),\n"
        ")\n"
    )
    cfg = load_config(str(p))
    assert cfg.tails[0].callback is not None


def test_cli_main_runs_and_stops(spark, tmp_path):
    """main() with --duration: starts the tail, ingests, stops clean.
    Reuses the session via get_spark's getOrCreate (same JVM)."""
    from log2ck_spark.__main__ import main

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "app.log").write_text(
        "[2024-01-01 10:00:00] app.INFO: one {} []\n"
        "[2024-01-01 10:00:01] app.WARN: two {} []\n"
    )
    cfg = _write_json_config(tmp_path, logs, tmp_path / "table", tmp_path / "ckpt")
    rc = main(["--config", str(cfg), "--duration", "8"])
    assert rc == 0
    assert spark.streams.active == []
    rows = spark.read.parquet(str(tmp_path / "table"))
    assert {r.message for r in rows.collect()} == {"one", "two"}
