"""Compatibility CLI shim mirroring the reference's option_new.py.

``build_option()`` returns a :class:`gcanet_tpu.config.Config` carrying every
reference flag (same names/defaults) plus the TPU-native extras.
"""

from gcanet_tpu.config import build_option  # noqa: F401
