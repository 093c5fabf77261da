"""Scene-level (ScanNet-style) dataset pipeline with fixed-shape batching.

TPU-native counterpart of the reference's ``softgroup/data/custom.py`` +
``softgroup/data/scannetv2.py``: glob-driven scene list, elastic distortion,
jitter/flip/rotate/scale augmentation, scene cropping to a point budget,
instance-label compaction and per-instance centroid offsets.  Feeds the
``SoftGroupNet`` scene model family (gcanet_tpu/models/softgroup_scene.py).

Differences from the reference, by design:
  * The reference collates scenes into one ragged concatenated tensor with a
    batch-index column (custom.py:192-230) because spconv consumes a global
    voxel hash.  The TPU layout is a fixed ``[B, N, ...]`` batch: each scene
    is subsampled (or repeat-padded) to exactly ``num_points`` so every
    shape is static under jit.
  * Input voxelisation (``voxelization_idx`` in the reference collate) is
    device-side in ``SoftGroupNet`` (scene scatter-mean), so the host emits
    points only.
  * Coordinates are normalised to the unit cube expected by the dense scene
    grid, instead of the reference's ``*voxel scale`` integer coords.

File formats: ``.pth`` tuples ``(xyz, rgb, sem_label, inst_label)`` exactly
as the reference's preprocessed ScanNet dumps (scannetv2.py:15-21), and
``.npz`` with keys ``xyz/rgb/semantic/instance``.
"""

from __future__ import annotations

import glob as _glob
import math
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from gcanet_tpu.config import Config


def elastic(x: np.ndarray, gran: float, mag: float,
            rng: np.random.RandomState) -> np.ndarray:
    """Elastic distortion (custom.py:52-74): trilinear-interpolated smoothed
    noise field added to the (voxel-scaled) coordinates."""
    import scipy.interpolate
    import scipy.ndimage

    blurs = [np.ones((3, 1, 1), np.float32) / 3,
             np.ones((1, 3, 1), np.float32) / 3,
             np.ones((1, 1, 3), np.float32) / 3]
    bb = np.abs(x).max(0).astype(np.int32) // gran + 3
    noise = [rng.randn(bb[0], bb[1], bb[2]).astype(np.float32)
             for _ in range(3)]
    for _ in range(2):
        for blur in blurs:
            noise = [scipy.ndimage.convolve(n, blur, mode="constant", cval=0)
                     for n in noise]
    ax = [np.linspace(-(b - 1) * gran, (b - 1) * gran, b) for b in bb]
    interp = [scipy.interpolate.RegularGridInterpolator(
        ax, n, bounds_error=False, fill_value=0) for n in noise]
    g = np.hstack([i(x)[:, None] for i in interp])
    return x + g * mag


def data_augment(xyz: np.ndarray, jitter: bool, flip: bool, rot: bool,
                 scale: bool, prob: float,
                 rng: np.random.RandomState) -> np.ndarray:
    """custom.py:93-112 — including the reference's fixed 0.35*pi rotation on
    the no-rot (eval) branch, kept for checkpoint-matching parity."""
    m = np.eye(3)
    if jitter and rng.rand() < prob:
        m = m + rng.randn(3, 3) * 0.1
    if flip and rng.rand() < prob:
        m[0][0] *= rng.randint(0, 2) * 2 - 1
    if rot and rng.rand() < prob:
        theta = rng.rand() * 2 * math.pi
        m = np.matmul(m, [[math.cos(theta), math.sin(theta), 0],
                          [-math.sin(theta), math.cos(theta), 0], [0, 0, 1]])
    else:
        theta = 0.35 * math.pi
        m = np.matmul(m, [[math.cos(theta), math.sin(theta), 0],
                          [-math.sin(theta), math.cos(theta), 0], [0, 0, 1]])
    if scale and rng.rand() < prob:
        xyz = xyz * rng.uniform(0.95, 1.05)
    return np.matmul(xyz, m)


def crop(xyz: np.ndarray, spatial_shape: int, max_npoint: int,
         rng: np.random.RandomState,
         step: int = 32) -> Tuple[np.ndarray, np.ndarray]:
    """custom.py:114-127 — shrink an xy window until <= max_npoint survive."""
    xyz_offset = xyz.copy()
    valid = xyz_offset.min(1) >= 0
    shape = np.array([spatial_shape] * 3, np.float64)
    room_range = xyz.max(0) - xyz.min(0)
    while valid.sum() > max_npoint:
        step_t = step * 2 if valid.sum() > 1e6 else step
        offset = np.clip(shape - room_range + 0.001, None, 0) * rng.rand(3)
        xyz_offset = xyz + offset
        valid = (xyz_offset.min(1) >= 0) & ((xyz_offset < shape).sum(1) == 3)
        shape[:2] -= step_t
    return xyz_offset, valid


def compact_instance_label(instance_label: np.ndarray) -> np.ndarray:
    """getCroppedInstLabel (custom.py:129-136): remap surviving instance ids
    to a dense 0..K-1 range (vectorised; ignore-label < 0 passes through)."""
    out = instance_label.copy()
    pos = out >= 0
    if pos.any():
        uniq, inv = np.unique(out[pos], return_inverse=True)
        out[pos] = inv
    return out


def instance_info(xyz: np.ndarray, instance_label: np.ndarray,
                  semantic_label: np.ndarray, max_instances: int,
                  cls_offset: int = 0
                  ) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """getInstanceInfo (custom.py:76-91) + the ScanNet class shift
    (scannetv2.py:23-27): per-instance point counts, class (semantic label of
    the instance minus ``cls_offset``), and per-point centroid offsets."""
    n = xyz.shape[0]
    pt_mean = np.full((n, 3), -100.0, np.float32)
    pointnum = np.zeros((max_instances,), np.int32)
    inst_cls = np.full((max_instances,), -100, np.int32)
    inst_num = max(int(instance_label.max()) + 1, 0) if n else 0
    for i in range(min(inst_num, max_instances)):
        mask = instance_label == i
        if not mask.any():
            continue
        pts = xyz[mask]
        pt_mean[mask] = pts.mean(0)
        pointnum[i] = int(mask.sum())
        c = int(semantic_label[np.argmax(mask)])
        # semantic classes below the offset (stuff/background on this
        # dataset) carry no instance class: mark ignore, never negative —
        # a negative label would index the classifier logits wrapped
        inst_cls[i] = c - cls_offset if c >= cls_offset else -100
    offsets = pt_mean - xyz
    return inst_num, pointnum, inst_cls, offsets


def load_scene(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        z = np.load(path)
        return {"xyz": z["xyz"], "rgb": z["rgb"],
                "semantic": z["semantic"], "instance": z["instance"]}
    import torch                                    # CPU torch, .pth dumps

    data = torch.load(path, weights_only=False)
    if len(data) == 2:                              # test split: no labels
        xyz, rgb = data
        zeros = np.zeros(np.asarray(xyz).shape[0], np.float32)
        data = (xyz, rgb, zeros, zeros)
    xyz, rgb, sem, inst = data
    return {"xyz": np.asarray(xyz), "rgb": np.asarray(rgb),
            "semantic": np.asarray(sem), "instance": np.asarray(inst)}


class SceneDataset:
    """ScanNet-style scene dataset (softgroup/data/custom.py:14-48).

    ``voxel_scale``/``spatial_shape``/``max_npoint`` mirror the reference's
    voxel_cfg; ``cls_offset=2`` reproduces the ScanNet instance-class shift.
    """

    def __init__(self, data_root: str, prefix: str, suffix: str, cfg: Config,
                 training: bool = True, with_label: bool = True,
                 repeat: int = 1, voxel_scale: float = 50.0,
                 spatial_shape: int = 512, max_npoint: int = 250000,
                 min_npoint: int = 5000, cls_offset: int = 2,
                 aug_prob: float = 1.0):
        self.cfg = cfg
        self.training = training
        self.with_label = with_label
        self.voxel_scale = voxel_scale
        self.spatial_shape = spatial_shape
        self.max_npoint = max_npoint
        self.min_npoint = min_npoint
        self.cls_offset = cls_offset
        self.aug_prob = aug_prob
        self.filenames: List[str] = \
            sorted(self.collect_filenames(data_root, prefix, suffix)) * repeat
        if not self.filenames:
            raise FileNotFoundError(
                f"Empty scene dataset: {data_root}/{prefix}/*{suffix}")
        self.suffix = suffix

    def collect_filenames(self, data_root, prefix, suffix) -> List[str]:
        return _glob.glob(os.path.join(data_root, prefix, "*" + suffix))

    def load(self, path: str) -> Dict[str, np.ndarray]:
        return load_scene(path)

    def __len__(self):
        return len(self.filenames)

    # -- per-scene transform (custom.py:138-168) ---------------------------
    def _transform(self, raw: Dict[str, np.ndarray],
                   rng: np.random.RandomState):
        xyz0, rgb = raw["xyz"].astype(np.float32), raw["rgb"].astype(np.float32)
        sem = raw["semantic"].astype(np.int32)
        inst = raw["instance"].astype(np.int32)
        if self.training:
            # NB reference passes aug_prob into the *scale* slot positionally
            # (custom.py:139 vs :93), so all four augs run at prob=1.0
            xyz_mid = data_augment(xyz0, True, True, True,
                                   bool(self.aug_prob), 1.0,
                                   rng).astype(np.float32)
            xyz = xyz_mid * self.voxel_scale
            if rng.rand() < self.aug_prob:
                xyz = elastic(xyz, 6, 40.0, rng)
                xyz = elastic(xyz, 20, 160.0, rng)
            xyz = xyz - xyz.min(0)
            for _ in range(5):
                xyz_off, valid = crop(xyz, self.spatial_shape,
                                      self.max_npoint, rng)
                if valid.sum() >= self.min_npoint:
                    xyz = xyz_off
                    break
            if valid.sum() < self.min_npoint:
                return None
            xyz, xyz_mid = xyz[valid], xyz_mid[valid]
            rgb, sem = rgb[valid], sem[valid]
            inst = compact_instance_label(inst[valid])
        else:
            xyz_mid = data_augment(xyz0, False, False, False, False,
                                   1.0, rng).astype(np.float32)
            xyz = xyz_mid * self.voxel_scale
            xyz = xyz - xyz.min(0)
            inst = compact_instance_label(inst)
        return xyz, xyz_mid, rgb, sem, inst

    def get(self, index: int,
            rng: np.random.RandomState) -> Optional[Dict[str, np.ndarray]]:
        path = self.filenames[index % len(self.filenames)]
        scan_id = os.path.basename(path).replace(self.suffix, "")
        out = self._transform(self.load(path), rng)
        if out is None:
            return None
        xyz, xyz_mid, rgb, sem, inst = out

        # fixed-shape budget: subsample without replacement when oversized,
        # repeat-pad when undersized (jit needs static N)
        n, target = xyz.shape[0], self.cfg.num_points
        if n >= target:
            sub = rng.choice(n, target, replace=False)
        else:
            sub = np.concatenate([np.arange(n),
                                  rng.choice(n, target - n, replace=True)])
        xyz, xyz_mid, rgb = xyz[sub], xyz_mid[sub], rgb[sub]
        sem, inst = sem[sub], compact_instance_label(inst[sub])

        if self.training:
            rgb = rgb + rng.randn(rgb.shape[1]).astype(np.float32) * 0.1

        # unit-cube coords for the dense scene grid.  Offset labels are
        # computed in THIS frame: the model clusters on
        # ``xyz_unit + pt_offsets`` (softgroup_scene.py), so meter-frame
        # labels would be scene-span-times too large.
        span = np.maximum(xyz.max(0) - xyz.min(0), 1e-6)
        xyz_unit = (xyz - xyz.min(0)) / span.max()
        inst_num, pointnum, inst_cls, offsets = instance_info(
            xyz_unit.astype(np.float32), inst, sem, self.cfg.max_instances,
            self.cls_offset)

        return {
            "index": scan_id,
            "xyz": xyz_unit.astype(np.float32),
            "coords_float": xyz_mid.astype(np.float32),
            "feats": rgb.astype(np.float32),
            "semantic": sem.astype(np.int32),
            "instance": inst.astype(np.int32),
            "pt_offset_label": offsets.astype(np.float32),
            "inst_num": inst_num,
            "inst_pointnum": pointnum,
            "inst_cls": inst_cls,
        }

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                shard: tuple = (0, 1),
                stride: tuple = (0, 1)) -> Iterator[Dict[str, np.ndarray]]:
        """Yield collated batches.

        ``shard=(rank, world)``: each process loads + collates only its
        contiguous chunk of every fixed global batch window (the multi-host
        analogue of the reference's DistributedSampler — seed the SAME on
        every process so the global order agrees).  Every rank yields exactly
        ``len(self) // batch_size`` batches — crop failures are retried with
        a re-salted RNG and finally padded from the chunk's other items, so
        ranks never de-synchronise the collective feed (a skipped batch on
        one rank would deadlock make_array_from_process_local_data).
        ``stride=(rank, world)``: batch-level striding for eval (process
        rank takes batches rank, rank+world, ...)."""
        rank, world = shard
        srank, sworld = stride
        rng = np.random.RandomState(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        if world > 1:
            from gcanet_tpu.parallel.dist import shard_bounds

            lo, hi = shard_bounds(batch_size, rank, world)  # raises on indiv.
        else:
            lo, hi = 0, batch_size

        def load(pos: int):
            """Slot-deterministic load with bounded crop retries: depends
            only on (seed, global slot, attempt) — never on other slots."""
            i = int(order[pos])
            for attempt in range(8):
                it = self.get(i, np.random.RandomState(
                    (seed * 100003 + pos + 29 * attempt) % (2 ** 31)))
                if it is not None:
                    return it
            return None                    # crop failed (custom.py:226 skips)

        if world > 1:
            for bi, start in enumerate(
                    range(0, len(order) - batch_size + 1, batch_size)):
                if bi % sworld != srank:
                    continue
                items = [load(start + off) for off in range(lo, hi)]
                ok = [it for it in items if it is not None]
                if not ok:                 # pathological: all crops failed
                    raise RuntimeError(
                        f"every crop in shard ({rank}/{world}) of batch {bi} "
                        f"failed after retries")
                items = [it if it is not None else ok[0] for it in items]
                yield self.collate(items)
            return

        # single process: reference semantics — failed crops are skipped and
        # the batch fills from the next successful scenes
        items: List[Dict[str, np.ndarray]] = []
        bi = 0
        for pos in range(len(order)):
            it = load(pos)
            if it is None:
                continue
            items.append(it)
            if len(items) == batch_size:
                if bi % sworld == srank:
                    yield self.collate(items)
                items = []
                bi += 1

    def collate(self, items: List[Dict[str, np.ndarray]]
                ) -> Dict[str, np.ndarray]:
        return collate_scene(items, self.cfg)


def collate_scene(items: List[Dict[str, np.ndarray]], cfg: Config
                  ) -> Dict[str, np.ndarray]:
    """[B, N, ...] fixed-shape batch + batch-global instance tables (the
    same layout the ABC collate emits, so the loss stack is shared)."""
    b, i_max = len(items), cfg.max_instances
    # coords_float (original meter frame) stays host-side per item —
    # nothing on device consumes it, and [B, N, 3] per batch is real
    # transfer time on a slow link
    batch = {k: np.stack([it[k] for it in items])
             for k in ("xyz", "feats", "semantic",
                       "instance", "pt_offset_label")}
    pointnum = np.zeros((b * i_max,), np.int32)
    inst_cls = np.full((b * i_max,), -100, np.int32)
    inst_valid = np.zeros((b * i_max,), bool)
    i_gt_global = np.full((b, cfg.num_points), -1, np.int32)
    for bi, it in enumerate(items):
        k = min(it["inst_num"], i_max)
        pointnum[bi * i_max: bi * i_max + k] = it["inst_pointnum"][:k]
        inst_cls[bi * i_max: bi * i_max + k] = it["inst_cls"][:k]
        inst_valid[bi * i_max: bi * i_max + k] = it["inst_pointnum"][:k] > 0
        lbl = it["instance"]
        ok = (lbl >= 0) & (lbl < i_max)
        i_gt_global[bi][ok] = lbl[ok] + bi * i_max
    batch["instance_pointnum"] = pointnum
    batch["instance_cls"] = inst_cls
    batch["inst_valid"] = inst_valid
    batch["I_gt_global"] = i_gt_global
    batch["index"] = [it["index"] for it in items]
    return batch


SCANNET_CLASSES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window", "bookshelf",
    "picture", "counter", "desk", "curtain", "refrigerator", "shower curtain",
    "toilet", "sink", "bathtub", "otherfurniture")       # scannetv2.py:9-11
SCANNET_NYU_ID = (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34,
                  36, 39)                                 # scannetv2.py:12


class ScanNetSceneDataset(SceneDataset):
    """scannetv2.py semantics: instance class = semantic - 2 (the base
    default), ``.pth`` tuples from the standard preprocessing."""

    CLASSES = SCANNET_CLASSES
    NYU_ID = SCANNET_NYU_ID


class S3DISSceneDataset(SceneDataset):
    """s3dis.py semantics: Area_N prefix lists, 6-tuple ``.pth`` payload,
    no instance-class shift, optional x4 train subsample (s3dis.py:33-40;
    the reference's x4 *test* piece-split maps to the fixed-size subsample
    of the base pipeline)."""

    CLASSES = ("ceiling", "floor", "wall", "beam", "column", "window", "door",
               "chair", "table", "bookcase", "sofa", "board", "clutter")

    def __init__(self, data_root: str, prefix, suffix: str, cfg: Config,
                 x4_split: bool = False, **kw):
        kw.setdefault("cls_offset", 0)
        self.x4_split = x4_split
        self._prefixes = [prefix] if isinstance(prefix, str) else list(prefix)
        super().__init__(data_root, prefix, suffix, cfg, **kw)

    def collect_filenames(self, data_root, prefix, suffix) -> List[str]:
        files: List[str] = []                              # s3dis.py:20-29
        for p in self._prefixes:
            files.extend(_glob.glob(os.path.join(data_root, p + "*" + suffix)))
        return files

    def load(self, path: str) -> Dict[str, np.ndarray]:
        import torch

        xyz, rgb, sem, inst, *_ = torch.load(path, weights_only=False)
        xyz, rgb = np.asarray(xyz), np.asarray(rgb)
        sem, inst = np.asarray(sem), np.asarray(inst)
        if self.training and self.x4_split:                # s3dis.py:33-40
            n = xyz.shape[0]
            inds = np.random.choice(n, int(n * 0.25), replace=False)
            xyz, rgb, sem = xyz[inds], rgb[inds], sem[inds]
            inst = compact_instance_label(inst[inds])
        return {"xyz": xyz, "rgb": rgb, "semantic": sem, "instance": inst}


class STPLS3DSceneDataset(SceneDataset):
    """stpls3d.py semantics: instance class = semantic - 1 (class 0 ignored)."""

    CLASSES = ("building", "low vegetation", "med. vegetation",
               "high vegetation", "vehicle", "truck", "aircraft",
               "militaryVehicle", "bike", "motorcycle", "light pole",
               "street sign", "clutter", "fence")

    def __init__(self, *args, **kw):
        kw.setdefault("cls_offset", 1)
        super().__init__(*args, **kw)


class KITTISceneDataset(SceneDataset):
    """kitti.py semantics: raw velodyne ``.bin`` + ``.label`` pairs remapped
    through ``semantic-kitti.yaml``'s learning_map with stuff 0-10 / thing
    11-18 / ignore -100 (kitti.py:40-49); stuff points carry no instance
    (kitti.py:69-73); instance class = semantic - 11.

    NB the semantic space spans 19 classes — configure ``num_primitives=19``
    (the default 7 cannot represent the thing classes)."""

    STUFF = ("road", "parking", "sidewalk", "otherground", "building",
             "fence", "vegetation", "trunk", "terrain", "pole",
             "traffic-sign")
    THING = ("car", "bicycle", "motorcycle", "truck", "other-vehicle",
             "person", "bicyclist", "motorcyclist")
    CLASSES = THING

    def __init__(self, data_root: str, prefix: str, suffix: str, cfg: Config,
                 **kw):
        import yaml

        kw.setdefault("cls_offset", 11)
        with open(os.path.join(data_root, "semantic-kitti.yaml")) as f:
            sk = yaml.safe_load(f)
        self._split = sk["split"][
            {"train": "train", "val": "valid", "test": "test"}[prefix]]
        lm = {}
        for k, v in sk["learning_map"].items():           # kitti.py:40-49
            lm[k] = -100 if v == 0 else (v + 10 if v < 9 else v - 9)
        self._learning_map = lm
        super().__init__(data_root, prefix, suffix, cfg, **kw)

    def collect_filenames(self, data_root, prefix, suffix) -> List[str]:
        files: List[str] = []                              # kitti.py:52-61
        for p in self._split:
            files.extend(_glob.glob(os.path.join(
                data_root, "sequences", f"{int(p):02d}", "velodyne",
                "*" + suffix)))
        return files

    def load(self, path: str) -> Dict[str, np.ndarray]:
        data = np.fromfile(path, np.float32).reshape(-1, 4)
        xyz, refl = data[:, :3], data[:, 3:]
        if self.with_label:
            # replace only the trailing velodyne dir + .bin suffix — a naive
            # substring replace corrupts data roots containing "bin"/"velodyne"
            d, fname = os.path.split(path)
            label_path = os.path.join(os.path.dirname(d), "labels",
                                      fname[:-len(".bin")] + ".label")
            label = np.fromfile(label_path, np.int32)
            sem = np.vectorize(self._learning_map.__getitem__)(label & 0xFFFF)
            inst = label.copy()
            inst[sem <= 10] = -100                         # stuff: no instance
            inst = compact_instance_label(inst)
        else:
            sem = np.zeros(xyz.shape[0], np.int32)
            inst = np.zeros(xyz.shape[0], np.int32)
        return {"xyz": xyz, "rgb": refl, "semantic": sem, "instance": inst}
