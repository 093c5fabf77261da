"""ABC/HPNet dataset pipeline with fixed-shape batching.

Replicates ``dataloader/ABCDataset_new.py`` semantics on numpy:
  * h5 keys points/labels/normals/prim/T_param     (:57-64)
  * optional augmentation + normal noise           (:66-75)
  * instances with <= 100 points -> background -1  (:82-89)
  * 10 -> 7 class fold (7,9 -> 6; 8 -> 2)          (:94-98)
  * random 7000-point subsample                    (:120-126)
  * per-instance pointnum/class + centroid offsets (:157-178)

Batching pads per-item instances to a static ``max_instances`` and emits
batch-global instance ids (see losses module docstring for why).  The
reference's CPU input-voxelisation (collate_fn:220) is intentionally dropped
from the hot path: the model only consumes ``v2p_map`` behind the always-false
``lvl_fusion`` flag (dgcnn-4.py:1068-1092); a parity op lives in
``gcanet_tpu.ops.voxelize.voxelization_idx``.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List

import numpy as np

from gcanet_tpu.config import Config
from gcanet_tpu.data.augment import AUGMENT_ROUTINES
from gcanet_tpu.data import native


def load_h5_object(path: str) -> Dict[str, np.ndarray]:
    import h5py

    with h5py.File(path, "r") as hf:
        return {
            "points": np.array(hf.get("points")),
            "labels": np.array(hf.get("labels")),
            "normals": np.array(hf.get("normals")),
            "prim": np.array(hf.get("prim")),
            "T_param": np.array(hf.get("T_param")),
        }


def process_object(raw: Dict[str, np.ndarray], cfg: Config, training: bool,
                   rng: np.random.RandomState) -> Dict[str, np.ndarray]:
    """ABCDataset_new.__getitem__ body (:50-152) for one object."""
    points = raw["points"].astype(np.float32)
    labels = raw["labels"].astype(np.int64)
    normals = raw["normals"].astype(np.float32)
    primitives = raw["prim"].astype(np.int64)
    t_param = raw["T_param"].astype(np.float32)

    if training and cfg.augment:
        points = AUGMENT_ROUTINES[rng.choice(5)](points[None])[0]
    if training and cfg.if_normal_noise:
        scale = 0.07
        noise = normals * np.clip(rng.randn(points.shape[0], 1) * scale,
                                  -scale, scale)
        points = (points + noise).astype(np.float32)

    # small instances (<=100 points) -> background, class fold, instance info —
    # native C++ fast path (csrc/gcadata.cpp) with numpy fallback
    label, clean_prim = native.relabel(labels, primitives, min_points=100,
                                       fold7=(cfg.num_primitives == 7))
    # I_gt_clean: background instances re-appended after the kept ones
    # (ABCDataset_new.py:106-110)
    n_keep = int(label.max()) + 1 if (label >= 0).any() else 0
    i_gt_clean = np.where(label >= 0, label.astype(np.int64),
                          labels + n_keep).astype(np.int32)

    n = cfg.num_points
    subidx = rng.choice(points.shape[0], n, replace=False)
    points, normals = points[subidx], normals[subidx]
    clean_prim, t_param, label = clean_prim[subidx], t_param[subidx], label[subidx]
    i_gt_clean = i_gt_clean[subidx]

    # per-instance info (ABCDataset_new.py:157-178)
    inst_num, pointnum, inst_cls, pt_offset_label = native.instance_info(
        points, label, clean_prim, cfg.max_instances)

    return {
        "gt_pc": points,
        "gt_normal": normals,
        "T_gt": clean_prim.astype(np.int32),
        "T_param": t_param,
        "I_gt": label.astype(np.int32),
        "I_gt_clean": i_gt_clean,
        "inst_num": inst_num,
        "inst_pointnum": pointnum,
        "inst_cls": inst_cls,
        "pt_offset_label": pt_offset_label,
    }


def collate(items: List[Dict[str, np.ndarray]], cfg: Config) -> Dict[str, np.ndarray]:
    """Fixed-shape batch with padded per-item instance tables."""
    b = len(items)
    i_max = cfg.max_instances
    batch = {
        k: np.stack([it[k] for it in items])
        for k in ("gt_pc", "gt_normal", "T_gt", "T_param", "I_gt", "pt_offset_label")
    }
    pointnum = np.zeros((b * i_max,), np.int32)
    inst_cls = np.zeros((b * i_max,), np.int32)
    inst_valid = np.zeros((b * i_max,), bool)
    i_gt_global = np.full((b, cfg.num_points), -1, np.int32)
    for bi, it in enumerate(items):
        k = min(it["inst_num"], i_max)
        pointnum[bi * i_max: bi * i_max + k] = it["inst_pointnum"][:k]
        inst_cls[bi * i_max: bi * i_max + k] = it["inst_cls"][:k]
        inst_valid[bi * i_max: bi * i_max + k] = it["inst_pointnum"][:k] > 0
        lbl = it["I_gt"]
        ok = (lbl >= 0) & (lbl < i_max)
        i_gt_global[bi][ok] = lbl[ok] + bi * i_max
    batch["instance_pointnum"] = pointnum
    batch["instance_cls"] = inst_cls
    batch["inst_valid"] = inst_valid
    batch["I_gt_global"] = i_gt_global
    return batch


class ABCDataset:
    """File-list driven dataset (ABCDataset_new.py:22-48 constructor semantics)."""

    def __init__(self, root: str, filename: str, cfg: Config,
                 skip: int = 1, fold: int = 1, training: bool = True):
        self.root = root
        self.cfg = cfg
        self.training = training
        with open(os.path.join(root, filename)) as f:
            self.data_list = [line.strip() for line in f][::skip]
        self.tru_len = len(self.data_list)
        self.len = self.tru_len * fold

    def __len__(self):
        return self.len

    def get(self, index: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        name = self.data_list[index % self.tru_len]
        raw = load_h5_object(os.path.join(self.root, name + ".h5"))
        item = process_object(raw, self.cfg, self.training, rng)
        item["index"] = name
        return item

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                shard: tuple = (0, 1),
                stride: tuple = (0, 1)) -> Iterator[Dict[str, np.ndarray]]:
        """Yield collated batches.

        ``shard=(rank, world)``: each process loads + collates only its
        contiguous chunk of every global batch (the multi-host analogue of the
        reference's DistributedSampler — seed the SAME on every process so the
        global order agrees).  ``stride=(rank, world)``: batch-level striding
        (process rank takes batches rank, rank+world, ... — the eval split,
        softgroup/util/dist.py:51-76 result-collection pattern)."""
        rank, world = shard
        srank, sworld = stride
        rng = np.random.RandomState(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        from gcanet_tpu.parallel.dist import shard_bounds

        lo, hi = shard_bounds(batch_size, rank, world)
        starts = range(0, len(order) - batch_size + 1, batch_size)
        for bi, start in enumerate(starts):
            if bi % sworld != srank:
                continue
            # per-item RNG seeded from (epoch seed, global slot) — NOT drawn
            # from a shared stream — so a rank loading only its chunk gets
            # bit-identical items to a single process loading the full batch
            items = [self.get(int(i), np.random.RandomState(
                        (seed * 100003 + start + off) % (2 ** 31)))
                     for off, i in enumerate(order[start + lo:start + hi],
                                             start=lo)]
            batch = collate(items, self.cfg)
            batch["index"] = [it["index"] for it in items]
            yield batch
