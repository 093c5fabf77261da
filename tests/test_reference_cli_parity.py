"""CLI-surface parity: every option_new.py flag exists here with the same
default — except the two documented TPU deviations (nn_nb, and max_proposals
which is a promoted hard-coded constant, not a reference flag).

Exec-loads the reference's argparse module (pure stdlib) and compares flag
sets and defaults against our build_option parser. Pins the "same flags,
same defaults" migration claim permanently. Skips where the snapshot is
absent.
"""

import argparse
import pathlib

import pytest

from gcanet_tpu.config import _add_args

REF = pathlib.Path("/root/reference/option_new.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")

# measured-safe TPU default deviations, each one flag away from parity
# (BASELINE.md round-2 log); {flag: (reference_default, ours)}
DEVIATIONS = {
    "nn_nb": (80, 48),
}


def _defaults(parser):
    return {a.dest: a.default for a in parser._actions
            if a.dest != "help"}


def test_every_reference_flag_exists_with_same_default():
    ns: dict = {}
    exec(compile(REF.read_text(), str(REF), "exec"), ns)
    ref_defaults = _defaults(ns["parser"])

    ours = argparse.ArgumentParser()
    _add_args(ours)
    our_defaults = _defaults(ours)

    missing = sorted(set(ref_defaults) - set(our_defaults))
    assert not missing, f"reference flags without a counterpart: {missing}"

    diffs = {}
    for k, ref_v in ref_defaults.items():
        our_v = our_defaults[k]
        if k in DEVIATIONS:
            assert (ref_v, our_v) == DEVIATIONS[k], (k, ref_v, our_v)
            continue
        if our_v != ref_v:
            diffs[k] = (ref_v, our_v)
    assert not diffs, f"undocumented default deviations: {diffs}"
