"""Build/packaging entry (reference: setup.py — CUDA extension build).

The TPU-native analogue of the reference's ``softgroup.ops`` CUDA extension is
the host data-prep library ``csrc/gcadata.cpp`` (voxel rule-book hashing,
instance-info, relabel loops).  ``build_ext`` compiles it with the ambient
``make`` toolchain and ships the shared object inside the wheel; every caller
has a pure-numpy fallback, so a build failure degrades, not breaks.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        csrc = os.path.join(here, "csrc")
        try:
            subprocess.run(["make", "-C", csrc], check=True)
            so = os.path.join(csrc, "libgcadata.so")
            dest = os.path.join(self.build_lib, "gcanet_tpu", "data")
            os.makedirs(dest, exist_ok=True)
            shutil.copy2(so, dest)
        except Exception as e:  # pragma: no cover - toolchain-dependent
            print(f"native build skipped ({e}); numpy fallbacks will be used")


setup(cmdclass={"build_py": BuildWithNative})
