"""bench_gate.py — the host-normalized per-query perf gate (r13).

VERDICT r12 task 2: the raw round-over-round BENCH numbers mislead
(126.9 vs 101.8 s was a 1.33x host factor, not a regression); the
gate must normalize by the q01 calibration and fail only on
regressions past each query's FITTED error bar. Green on the real
(r11, r12) pair; red on a synthetic regression fixture."""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "bench_gate.py")
R11 = os.path.join(REPO, "BENCH_local_r11.json")
R12 = os.path.join(REPO, "BENCH_local_r12.json")


def run_gate(*args: str):
    return subprocess.run(
        [sys.executable, GATE, *args], capture_output=True, text=True)


def test_fit_writes_model(tmp_path):
    out = tmp_path / "model.json"
    r = run_gate("fit", "--out", str(out))
    assert r.returncode == 0, r.stderr
    model = json.loads(out.read_text())["queries"]
    assert len(model) >= 150
    # fitted bars exist and most are tighter than the legacy 2.0x
    tight = [q for q, m in model.items() if m["tolerance"] < 2.0]
    assert len(tight) > len(model) // 2
    assert all(m["tolerance"] >= 1.30 for m in model.values())


def test_gate_green_on_real_round_pair():
    r = run_gate("check", R11, R12)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 fail" in r.stdout
    # the host factor the fixed-threshold analysis had to hand-derive
    assert "host factor" in r.stdout


def test_gate_red_on_synthetic_regression(tmp_path):
    with open(R12) as f:
        d = json.load(f)
    d["queries"]["q111_pagerank"] = d["queries"]["q111_pagerank"] * 4
    fixture = tmp_path / "regressed.json"
    fixture.write_text(json.dumps(d))
    r = run_gate("check", R11, str(fixture))
    assert r.returncode == 1
    assert "q111_pagerank" in r.stdout and "FAIL" in r.stdout


def test_gate_red_on_broken_query(tmp_path):
    with open(R12) as f:
        d = json.load(f)
    d["queries"]["q64_fuzzy_join"] = -1.0  # bench.py's error marker
    fixture = tmp_path / "broken.json"
    fixture.write_text(json.dumps(d))
    r = run_gate("check", R11, str(fixture))
    assert r.returncode == 1
    assert "errored in NEW" in r.stdout


def test_gate_red_on_dropped_query(tmp_path):
    with open(R12) as f:
        d = json.load(f)
    del d["queries"]["q64_fuzzy_join"]
    fixture = tmp_path / "dropped.json"
    fixture.write_text(json.dumps(d))
    r = run_gate("check", R11, str(fixture))
    assert r.returncode == 1
    assert "dropped in NEW" in r.stdout


def test_host_factor_alone_never_fails(tmp_path):
    """A uniformly 3x slower host (every time AND the calibration
    scaled together) is exactly the confound the gate exists to
    clear — zero failures."""
    with open(R12) as f:
        d = json.load(f)
    d["queries"] = {q: (t * 3 if t and t > 0 else t)
                    for q, t in d["queries"].items()}
    d["calibration"]["sec"] = d["calibration"]["sec"] * 3
    fixture = tmp_path / "slowhost.json"
    fixture.write_text(json.dumps(d))
    r = run_gate("check", R11, str(fixture))
    assert r.returncode == 0, r.stdout
    assert "host factor 2.7" in r.stdout or "host factor 2.8" in r.stdout
