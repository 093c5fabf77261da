"""ctypes bindings for the native host data-prep library (csrc/gcadata.cpp).

Auto-builds ``libgcadata.so`` on first use if a toolchain is present; every
entry point has a pure-numpy fallback so the framework works without it.  The
native path matters at high accelerator throughput: the reference spends its
host budget in exactly these loops (CPU voxel hashing in collate,
ABCDataset_new.py:220; per-instance python loops :157-178).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # an installed wheel ships the .so next to this module (setup.py);
    # a source checkout builds it in csrc/ on first use
    packaged = os.path.join(os.path.dirname(__file__), "libgcadata.so")
    so = packaged if os.path.exists(packaged) \
        else os.path.abspath(os.path.join(_CSRC, "libgcadata.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gca_voxelize_idx.restype = ctypes.c_int64
    lib.gca_voxelize_idx.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
    lib.gca_instance_info.restype = ctypes.c_int32
    lib.gca_instance_info.argtypes = [f32p, i32p, i32p, ctypes.c_int64,
                                      ctypes.c_int32, i32p, i32p, f32p]
    lib.gca_relabel.restype = None
    lib.gca_relabel.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_int32, i32p, i32p]
    _LIB = lib
    return lib


def voxelize_idx(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
    """coords [N, 4] int (batch, x, y, z) -> (out_coords [V, 4], p2v [N], V)."""
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    lib = _load()
    if lib is not None:
        p2v = np.empty(n, np.int32)
        out = np.empty((n, 4), np.int32)
        v = int(lib.gca_voxelize_idx(coords, n, p2v, out))
        return out[:v], p2v, v
    # numpy fallback: stable first-occurrence dedupe
    _, first_idx, inv = np.unique(
        coords.astype(np.int64) @ np.array([2**48, 2**32, 2**16, 1], np.int64),
        return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_idx))
    p2v = order[inv].astype(np.int32)
    out = np.empty((len(first_idx), 4), np.int32)
    out[p2v] = coords
    return out, p2v, len(first_idx)


def instance_info(xyz: np.ndarray, labels: np.ndarray, semantic: np.ndarray,
                  max_inst: int):
    """-> (inst_num, pointnum [max_inst], cls [max_inst], offsets [N, 3])."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    semantic = np.ascontiguousarray(semantic, np.int32)
    lib = _load()
    if lib is not None:
        pointnum = np.zeros(max_inst, np.int32)
        cls = np.zeros(max_inst, np.int32)
        offsets = np.empty((len(xyz), 3), np.float32)
        num = int(lib.gca_instance_info(xyz, labels, semantic, len(xyz),
                                        max_inst, pointnum, cls, offsets))
        return num, pointnum, cls, offsets
    num = max(int(labels.max()) + 1, 0) if len(labels) else 0
    num = min(num, max_inst)
    pointnum = np.zeros(max_inst, np.int32)
    cls = np.zeros(max_inst, np.int32)
    pt_mean = np.full((len(xyz), 3), -100.0, np.float32)
    for i in range(num):
        idx = np.where(labels == i)[0]
        if idx.size:
            pt_mean[idx] = xyz[idx].mean(0)
            pointnum[i] = idx.size
            cls[i] = semantic[idx[0]]
    return num, pointnum, cls, pt_mean - xyz


def relabel(raw_labels: np.ndarray, prim: np.ndarray, min_points: int = 100,
            fold7: bool = True):
    """-> (labels [N] int32 compacted/-1, clean_prim [N] int32)."""
    raw_labels = np.ascontiguousarray(raw_labels, np.int64)
    prim = np.ascontiguousarray(prim, np.int64)
    lib = _load()
    n = len(raw_labels)
    if lib is not None:
        labels = np.empty(n, np.int32)
        out_prim = np.empty(n, np.int32)
        lib.gca_relabel(raw_labels, prim, n, min_points, int(fold7),
                        labels, out_prim)
        return labels, out_prim
    from collections import Counter

    counter = Counter(raw_labels.tolist())
    mapper = {}
    labels = np.full(n, -1, np.int32)
    for i, l in enumerate(raw_labels):
        if counter[l] > min_points:
            if l not in mapper:
                mapper[l] = len(mapper)
            labels[i] = mapper[l]
    out_prim = np.where(labels >= 0, prim, -1).astype(np.int32)
    if fold7:
        out_prim[(out_prim == 7) | (out_prim == 9)] = 6
        out_prim[out_prim == 8] = 2
    return labels, out_prim
