"""Perf-trend history + regression gate (scripts/perf_trend.py).

Reference role: performance_benchmarks.yml daily history +
scripts/check_fst_regression.py regression gate.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "scripts", "perf_trend.py")


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location("perf_trend", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.HISTORY = str(tmp_path / "history.jsonl")
    return mod


def test_extract_flat_and_wrapped(tmp_path):
    pt = _load(tmp_path)
    line = {"metric": "reuters_or20_throughput", "value": 1000.0,
            "mixed_qps": 50.0, "or20_10m_qps": 7.0}
    assert pt.extract(line) == {
        "or20_qps": 1000.0, "mixed_qps": 50.0, "or20_10m_qps": 7.0}
    # driver wrapper: metrics live under "parsed"
    assert pt.extract({"rc": 0, "parsed": line})["or20_qps"] == 1000.0


def test_gate_trips_on_regression(tmp_path):
    pt = _load(tmp_path)
    with open(pt.HISTORY, "w") as f:
        f.write(json.dumps({"or20_qps": 1000.0, "ts": "t0"}) + "\n")
    best = pt.best_so_far(pt.load_history())
    # 10% drop passes at 20% tolerance
    assert pt.check({"or20_qps": 900.0}, best, 0.20) == []
    # 30% drop fails
    regs = pt.check({"or20_qps": 700.0}, best, 0.20)
    assert len(regs) == 1 and regs[0][0] == "or20_qps"
    # lower-is-better metric direction
    with open(pt.HISTORY, "a") as f:
        f.write(json.dumps({"columnar_q9_device_us": 100.0}) + "\n")
    best = pt.best_so_far(pt.load_history())
    assert pt.check({"columnar_q9_device_us": 130.0}, best, 0.20)
    assert not pt.check({"columnar_q9_device_us": 110.0}, best, 0.20)


def test_cli_record_and_gate(tmp_path):
    env = dict(os.environ)
    hist = tmp_path / "benchmarks" / "performance_history.jsonl"
    # run via subprocess against a copied script dir so HISTORY resolves
    # under tmp_path (HISTORY is derived from the script's location)
    sdir = tmp_path / "scripts"
    sdir.mkdir()
    with open(SCRIPT) as f:
        (sdir / "perf_trend.py").write_text(f.read())
    run = lambda *a: subprocess.run(
        [sys.executable, str(sdir / "perf_trend.py"), *a],
        capture_output=True, text=True, env=env)
    r = run("record", '{"metric": "x", "value": 500.0}', "--no-gate")
    assert r.returncode == 0, r.stderr
    assert hist.exists()
    r = run("record", '{"metric": "x", "value": 100.0}')
    assert r.returncode == 1  # 80% drop trips the gate
    assert "REGRESSION" in r.stderr
    r = run("report")
    assert r.returncode == 0 and "or20_qps" in r.stdout
