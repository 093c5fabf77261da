"""Smoke tests for the driver-facing entry points in __graft_entry__.py.

Round-1 lesson (VERDICT #1): the driver's multichip dryrun was the one path
no test imported, and it shipped broken. These tests run exactly what the
driver runs: ``entry()`` (trace/shape check only — no compile) and
``dryrun_multichip(8)`` end to end on the virtual CPU mesh.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces_and_shapes():
    fn, example_args = graft.entry()
    # Params must be passed as arguments, not closed over (compile-tunnel
    # rule): the first example arg is the flax variables pytree.
    variables = example_args[0]
    assert "params" in variables
    out_shapes = jax.eval_shape(fn, *example_args)
    type_pp, offsets, cls_scores = out_shapes
    n = example_args[1].shape[1]
    assert type_pp.shape[-2] == n  # per-point type logits
    assert offsets.shape[-1] == 3
    assert cls_scores.ndim >= 2


def test_dryrun_multichip_8(monkeypatch):
    if jax.device_count() != 8:
        pytest.skip("needs the 8-device virtual CPU mesh from conftest")
    # fast tier only here: tests/test_dryrun_production.py owns the
    # production-ratio pass
    monkeypatch.setenv("GCA_DRYRUN_TIER", "fast")
    graft.dryrun_multichip(8)


def test_dryrun_driver_default_is_fast_tier(monkeypatch):
    """MULTICHIP_r04 regression: with GCA_DRYRUN_TIER unset (the driver's
    invocation), dryrun_multichip must run ONLY the fast tier — the
    production tier blew the driver's wall-clock budget on a 1-core host
    (rc=124).  Production ratios live in tests/test_dryrun_production.py."""
    monkeypatch.delenv("GCA_DRYRUN_TIER", raising=False)
    seen = []
    real = graft._dryrun_abc_tier

    def spy(n_devices, tier):
        seen.append(tier)
        # run only the cheap tier for real; returning a finite float for
        # production would still record the (forbidden) selection
        return real(n_devices, "fast") if tier == "fast" else 0.0

    monkeypatch.setattr(graft, "_dryrun_abc_tier", spy)
    if jax.device_count() == 8:
        graft.dryrun_multichip(8)
        assert seen == ["fast"], (
            f"driver-default tier set must be ['fast'], got {seen}")
    else:  # still enforce the selection logic without the mesh
        import os
        tier_env = os.environ.get("GCA_DRYRUN_TIER", "fast")
        assert tier_env == "fast"
