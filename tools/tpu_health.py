"""Fail-fast health probe for the tunnelled TPU (axon plugin).

A dead tunnel relay makes every jax call — even ``jax.devices()`` — block
forever at 0%% CPU with no error.  This probe checks the transport before
touching jax, then bounds the first device op, so scripts and sessions can
tell "TPU gone" from "compile in progress" in seconds:

    python tools/tpu_health.py && python bench.py

Exit codes: 0 healthy, 1 relay dead/ports closed, 2 device op timed out.
"""

import os
import socket
import subprocess
import sys

RELAY_PORTS = (8082, 8083, 8087)   # axon relay listen ports (.tpu_init.py)


def relay_alive() -> bool:
    """True if the stdio relay process and its listen ports are up."""
    try:
        out = subprocess.run(["pgrep", "-f", r"tpu_init\.py"],
                             capture_output=True, text=True, timeout=5)
        if not out.stdout.strip():
            return False
    except Exception:  # pgrep missing — fall through to the port check
        pass
    for port in RELAY_PORTS:
        with socket.socket() as s:
            s.settimeout(1.0)
            try:
                s.connect(("127.0.0.1", port))
                return True
            except OSError:
                continue
    return False


def device_op_ok(timeout_s: int = 60) -> bool:
    """Run a trivial device op in a bounded subprocess (jax can't be
    interrupted once it blocks in the plugin, so probe out-of-process)."""
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.ones((8, 8)).sum()), jax.devices()[0].platform)")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        return out.returncode == 0 and "64.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if not relay_alive():
        print("TPU tunnel relay DEAD (no tpu_init.py process / relay port "
              "closed) — TPU unavailable; pin scripts to CPU with "
              'jax.config.update("jax_platforms", "cpu")')
        return 1
    timeout_s = int(os.environ.get("GCA_TPU_PROBE_TIMEOUT", "60"))
    if not device_op_ok(timeout_s):
        print(f"TPU relay up but device op did not complete in {timeout_s}s "
              "(another client may hold the tunnel, or a cold remote "
              "compile is in flight — retry with a larger "
              "GCA_TPU_PROBE_TIMEOUT)")
        return 2
    print("TPU healthy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
