"""Multi-host / multi-device helpers.

TPU-native equivalents of the reference's NCCL machinery
(softgroup/util/dist.py): ``init_dist`` becomes jax distributed init;
``collect_results_gpu/cpu`` (:51-112) becomes ``process_allgather``;
``get_dist_info`` (:40-48) maps to process index/count; the "master-only"
logging pattern is ``is_main_process``.  Gradient all-reduce lives inside the
train step (psum over the mesh) — see gcanet_tpu/train/step.py.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import numpy as np


def init_dist(coordinator: Optional[str] = None, num_processes: int = 1,
              process_id: int = 0) -> None:
    """Multi-host initialisation (no-op single-host).  Reference:
    softgroup/util/dist.py:34-37 init_dist('nccl')."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def maybe_init_from_env() -> bool:
    """Initialise multi-host jax from environment variables, mirroring the
    reference's env-driven launch (softgroup/util/dist.py:20-37 reads
    RANK/WORLD_SIZE/MASTER_ADDR set by the launcher).

    Recognised: ``GCA_COORDINATOR`` (host:port), ``GCA_NUM_PROCESSES``,
    ``GCA_PROCESS_ID``.  On Cloud TPU pods with no env set,
    ``jax.distributed.initialize()``'s own auto-detection can be invoked with
    ``GCA_DIST_AUTO=1``.  Returns True when an initialisation happened.
    """
    import os

    if os.environ.get("GCA_DIST_AUTO") == "1":
        jax.distributed.initialize()
        return True
    n = int(os.environ.get("GCA_NUM_PROCESSES", "1"))
    if n > 1:
        coordinator = os.environ.get("GCA_COORDINATOR")
        if not coordinator:
            raise ValueError(
                "GCA_NUM_PROCESSES > 1 requires GCA_COORDINATOR=host:port "
                "(and GCA_PROCESS_ID per process)")
        init_dist(coordinator, n, int(os.environ.get("GCA_PROCESS_ID", "0")))
        return True
    return False


def shard_bounds(batch_size: int, rank: int, world: int):
    """This process's contiguous [start, stop) slice of the global batch.

    The global batch is laid out as ``world`` contiguous chunks so each
    device's shard_map shard comes from the process that loaded it (replaces
    the reference's per-rank DistributedSampler slice,
    softgroup/util/dist.py:51-76 usage).
    """
    if batch_size % world:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"process_count {world}")
    local = batch_size // world
    return rank * local, (rank + 1) * local


def get_dist_info():
    """-> (rank, world_size) (softgroup/util/dist.py:40-48)."""
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def _encode_part(part: List[Any]) -> np.ndarray:
    """Pickle a python result list into a flat uint8 array (allgather-able)."""
    import pickle

    return np.frombuffer(pickle.dumps(part), dtype=np.uint8)


def _decode_rows(rows: np.ndarray, sizes: np.ndarray) -> List[Any]:
    """Inverse of ``_encode_part`` over a [world, maxlen] gathered buffer."""
    import pickle

    out: List[Any] = []
    for row, size in zip(np.asarray(rows), np.asarray(sizes).ravel()):
        out.extend(pickle.loads(np.asarray(row)[: int(size)].tobytes()))
    return out


def collect_results(part: List[Any]) -> List[Any]:
    """Gather per-process python results to every process.

    Reference softgroup/util/dist.py:51-76 pickles tensors over NCCL; here the
    part list is pickled to bytes, zero-padded to the max length across
    processes (``process_allgather`` needs identical shapes), gathered as a
    fixed-shape uint8 array, and unpickled per row.  Identity single-process.
    """
    if jax.process_count() == 1:
        return part
    from jax.experimental import multihost_utils

    data = _encode_part(part)
    sizes = multihost_utils.process_allgather(
        np.asarray([data.size], np.int64))
    buf = np.zeros((int(np.max(sizes)),), np.uint8)
    buf[: data.size] = data
    rows = multihost_utils.process_allgather(buf)
    return _decode_rows(rows, sizes)


class AverageMeter:
    """softgroup/util/utils.py:13-51 with cross-process reduction on update."""

    def __init__(self, apply_dist_reduce: bool = False):
        self.apply_dist_reduce = apply_dist_reduce
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    def get_val(self):
        return self._reduce(self.val)

    def get_avg(self):
        """Count-weighted global average: one allgather of (sum, count)
        instead of averaging per-process averages (the reference's
        all_reduce/world_size, softgroup/util/utils.py:23-38, is biased when
        per-process counts differ)."""
        if not self.apply_dist_reduce or jax.process_count() == 1:
            return self.sum / max(self.count, 1)
        from jax.experimental import multihost_utils

        rows = multihost_utils.process_allgather(
            np.asarray([self.sum, float(self.count)]))
        tot = np.sum(np.asarray(rows), axis=0)
        return float(tot[0] / max(tot[1], 1.0))

    def _reduce(self, v: float) -> float:
        if not self.apply_dist_reduce or jax.process_count() == 1:
            return v
        from jax.experimental import multihost_utils

        vals = multihost_utils.process_allgather(np.asarray([v]))
        return float(np.mean(vals))
