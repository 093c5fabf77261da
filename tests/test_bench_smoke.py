"""Smoke tests for bench.py — the driver's headline-benchmark artifact.

Round-1 lesson (VERDICT #1, generalised): every driver-facing entry point
needs a test that runs exactly what the driver runs.  bench.py is executed at
the end of every round on the real TPU; here we run it as a subprocess at toy
shapes on CPU (GCA_PLATFORM=cpu) and assert the one-JSON-line contract, for
both the single-device path and the GCA_BENCH_MESH data-parallel path.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

_TOY = {
    "GCA_PLATFORM": "cpu",
    "GCA_BENCH_BATCH": "2",
    "GCA_BENCH_POINTS": "128",
    "GCA_BENCH_PROPOSALS": "8",
    "GCA_BENCH_NN": "16",
    "GCA_BENCH_ITERS": "2",
}


def _run_bench(extra_env):
    env = dict(os.environ, **_TOY, **extra_env)
    # toy CPU compile of the full train step still takes a while on 1 core
    r = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                       capture_output=True, text=True, env=env,
                       cwd=str(ROOT), timeout=3000)
    assert r.returncode == 0, f"bench.py failed: {r.stderr[-2000:]}"
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected ONE json line, got: {r.stdout!r}"
    row = json.loads(lines[0])
    assert row["metric"] == "train_clouds_per_sec_per_chip_8k_pts"
    assert row["unit"] == "clouds/s"
    assert row["value"] > 0 and row["vs_baseline"] > 0
    return row


def test_bench_config_strict_parity_knobs(monkeypatch):
    """The strict-parity bench line (VERDICT r2 item 2) disengages every
    deviation knob via env: K=80 uniform, p=200, exact kNN, fp32."""
    from gcanet_tpu.config import bench_config

    for k, v in {"GCA_BENCH_NN": "80", "GCA_BENCH_NN_INNER": "0",
                 "GCA_BENCH_PROPOSALS": "200", "GCA_BENCH_KNN": "xla"}.items():
        monkeypatch.setenv(k, v)
    cfg = bench_config()
    assert (cfg.nn_nb, cfg.nn_nb_inner, cfg.knn_impl) == (80, 0, "xla")
    assert cfg.instance_head.max_proposals == 200
    assert not cfg.encoder_bf16 and cfg.precision == "fp32"


def test_bench_single_device_contract():
    row = _run_bench({"GCA_BENCH_MESH": "1"})
    assert "devices" not in row


def test_bench_mesh_mode_contract():
    row = _run_bench({
        "GCA_BENCH_MESH": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    assert row["devices"] == 2
    assert row["total_clouds_per_sec"] > 0
