"""tools/gate_report.py — convergence-gate collation (pure host-side)."""

import json
import subprocess
import sys
import os

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "gate_report.py")


def _write(tmp_path, name, rows, header="# test"):
    p = tmp_path / name
    with open(p, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def _run(*argv):
    return subprocess.run([sys.executable, TOOL, *argv],
                          capture_output=True, text=True)


def test_pass_and_fail_gates(tmp_path):
    ctrl = _write(tmp_path, "conv_ctrl_s0.jsonl", [
        {"step": 0, "miou": 0.2, "type_miou": 0.3, "t_min": 1.0},
        {"step": 1000, "miou": 0.86, "type_miou": 0.97, "t_min": 9.0},
    ])
    good = _write(tmp_path, "conv_good_s0.jsonl", [
        {"step": 1000, "miou": 0.85, "type_miou": 0.99, "t_min": 9.0},
    ])
    bad = _write(tmp_path, "conv_bad_s0.jsonl", [
        {"step": 1000, "miou": 0.84, "type_miou": 0.88, "t_min": 9.0},
    ])

    r = _run("--pair", "good=ctrl", ctrl, good, bad)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS  good_s0 vs ctrl_s0" in r.stdout

    r = _run("--pair", "bad=ctrl", ctrl, good, bad)
    assert r.returncode == 2
    assert "FAIL  bad_s0 vs ctrl_s0" in r.stdout
    assert "GATE FAILED" in r.stdout


def test_truncated_run_compares_at_common_step(tmp_path):
    # A run killed mid-write (relay wedge) leaves a truncated final line —
    # the comparison must use the last complete common step, not crash.
    ctrl = _write(tmp_path, "conv_c.jsonl", [
        {"step": 500, "miou": 0.80, "type_miou": 0.90},
        {"step": 1000, "miou": 0.86, "type_miou": 0.97},
    ])
    p = tmp_path / "conv_x.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"step": 500, "miou": 0.81, "type_miou": 0.91})
                + "\n")
        f.write('{"step": 750, "miou": 0.8')  # truncated tail
    r = _run("--pair", "x=c", ctrl, str(p))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "@step 500" in r.stdout


def test_missing_files_and_ambiguous_pairs(tmp_path):
    a = _write(tmp_path, "conv_i32_def_s3.jsonl",
               [{"step": 1000, "miou": 0.85, "type_miou": 0.97}])
    b = _write(tmp_path, "conv_i32_hard_s2.jsonl",
               [{"step": 1000, "miou": 0.85, "type_miou": 0.97}])
    # fragment "i32" matches both -> reported, gate fails closed
    r = _run("--pair", "i32=i32_def", a, b, str(tmp_path / "nope.jsonl"))
    assert r.returncode == 2
    assert "matched" in r.stderr
