"""Configuration surface for the TPU-native GCANet framework.

Mirrors the reference CLI semantics (``/root/reference/option_new.py:1-220``): every
flag there exists here with the same name and default.  On top of that, the
TPU build promotes the constants that the reference hard-codes inside the model
(grouping thresholds at ``models/dgcnn-hais-concat-direct-4.py:1138-1163``, proposal
caps at ``:575``, instance-head shapes) into explicit config fields, and adds the
static-shape / sharding knobs a jit-compiled pipeline needs.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Tuple


@dataclasses.dataclass
class GroupingConfig:
    """Instance-grouping constants (reference: dgcnn-hais-concat-direct-4.py:1138-1163)."""

    radius: float = 0.03
    similarity_threshold_inst: float = 0.989
    similarity_threshold_para: float = 0.0
    mean_active: int = 300            # only relevant to the CUDA CSR budget; kept for parity docs
    npoint_thr: float = 0.15
    score_thr: float = 0.45
    min_npoint: int = 50              # per-class minimum point count to attempt grouping
    # Per-semantic-class mean instance sizes used by the HAIS fragment/primary split.
    # NOTE: these are the values hard-coded inside the C++ op
    # (hierarchical_aggregation.cpp:7-8), NOT the ones in the Python model file —
    # the Python list at dgcnn-4.py:1157 is computed but never passed down.
    class_numpoint_mean: Tuple[float, ...] = (
        -1.0, -1.0, 3917.0, 12056.0, 2303.0, 8331.0, 3948.0, 3166.0, 5629.0, 11719.0)
    # Scene family (vendored SoftGroup) soft grouping: classes excluded from
    # clustering (softgroup.py:434 ``ignore_classes`` — e.g. wall/floor on
    # ScanNet).  Unused by the ABC argmax path.
    ignore_classes: Tuple[int, ...] = ()
    low_frac: float = 0.05            # kept-fragment lower bound (hierarchical_aggregation.cpp:60)
    high_frac: float = 0.3            # primary threshold (hierarchical_aggregation.cpp:61)
    set_aggr_r_coeff: float = 0.01    # r_set = coeff * sqrt(primary_npoint) (hierarchical_aggregation.cu:51)
    # Strict-parity caps replicating the CUDA buffer limits (0 = uncapped,
    # the TPU default — COMPONENTS.md deviations #3/#5).  Reference values:
    # neighbor_cap=3000 (bfs_cluster.cu:30 idx_temp), absorb_fragment_cap=1000
    # and absorb_point_cap=3000 (hierarchical_aggregation.cu:9-11).  Enable
    # all three with ``--strict_caps`` (train_new CLI) for dense real scenes
    # where the reference's truncation changes outputs.
    neighbor_cap: int = 0
    absorb_fragment_cap: int = 0
    absorb_point_cap: int = 0
    cc_max_iters: int = 64            # label-propagation budget for connected components
    # CC sweep implementation: "auto" (pallas on TPU, xla elsewhere),
    # "xla" (select+min reduce) or "pallas" (tiled VMEM kernel,
    # ops/cc_pallas.py).  ADOPTED as the TPU default 2026-08-20 round 3:
    # paired end-to-end A/B 23.503 vs 23.201 clouds/s (+1.3%), stage
    # isolation 52.96 vs 62.70 ms; numerically identical sweep (oracle
    # tests), so no convergence gate needed.  A/B via GCA_BENCH_CC_PALLAS.
    cc_impl: str = "auto"
    # "map" (default): sequential lax.map over batch items — one N x N working
    # set at a time, every CC while-loop exits as soon as ITS item converges.
    # "vmap": batch the graphs/CC sweeps across items — B x N x N working set,
    # the slowest item gates every iteration.  Measured -3% at B=10/p=200/K=80
    # (BASELINE.md round-1 rejects); re-testable at new defaults via
    # GCA_BENCH_GROUP_VMAP=1.
    item_batch_mode: str = "map"


def scene_grouping_defaults(
        base: "GroupingConfig | None" = None,
        class_numpoint_mean: "Tuple[float, ...] | None" = None,
) -> "GroupingConfig":
    """Scene-family (vendored SoftGroup) grouping constants.

    The vendored tree ships no YAML configs, so these follow the public
    SoftGroup scannetv2 recipe: ``score_thr`` 0.2, ``npoint_thr`` 0.05 and
    classes 0/1 (wall/floor) excluded from grouping.  The per-class mean
    table stays the reference's ScanNet-scale values
    (hierarchical_aggregation.cpp:7 — the GroupingConfig default) unless
    ``class_numpoint_mean`` overrides it: the keep rule is ``size >=
    npoint_thr * mean`` (bfs_cluster.cpp:88-94), so the means MUST match
    the data's instance scale — the synthetic drivers pass their own
    (``num_points / instances``).  A ``-1`` mean degrades the rule to the
    raw 0.05 threshold, which keeps every singleton junk cluster and
    saturates the class-major ``max_proposals`` truncation (measured as an
    AP50 collapse 0.95 -> 0.71 on the soft-grouping A/B, round 5).
    """
    base = base if base is not None else GroupingConfig()
    kw = {}
    if class_numpoint_mean is not None:
        kw["class_numpoint_mean"] = tuple(class_numpoint_mean)
    return dataclasses.replace(
        base, score_thr=0.2, npoint_thr=0.05, ignore_classes=(0, 1), **kw)


@dataclasses.dataclass
class InstanceHeadConfig:
    """TPU-native replacement of the spconv tiny U-Net (dgcnn-4.py:611-615, 1300-1392).

    The reference voxelises each proposal into a 64^3 sparse grid; on TPU we use a
    dense low-resolution grid per proposal with masked dense convolutions, which is
    numerically equivalent to submanifold sparse convs at the active sites.
    """

    grid_size: int = 16               # dense per-proposal grid (reference: 64 sparse)
    channels: int = 64
    # Train-time proposal cap.  Reference uses 200 (dgcnn-4.py:575,749-752);
    # the TPU default is 100: the head's cost is proportional to this static
    # cap and at 200 most slots are padding.  A/B convergence at 100 matches
    # 200 on both the default and the hard (8-16 instance) mixes within run
    # noise (BASELINE.md round-2 log); set 200 for strict reference parity.
    max_proposals: int = 100
    bn_eps: float = 1e-4              # norm_fn at dgcnn-4.py:605
    bn_momentum: float = 0.1


@dataclasses.dataclass
class Config:
    """Full framework config; field names follow option_new.py where they overlap."""

    # --- data parameters (option_new.py:5-76) ---
    num_primitives: int = 7
    mode: int = 5                     # 0: xyz only; 3: xyz, predict normal; 5: xyz+normal input
    ablation: bool = False
    using_set_aggr: bool = False
    # the reference's dotted default (option_new.py); the registry maps it
    # (and "gcanet_tpu.models.primitive_net") to the flagship PrimitiveNet
    model_dict: str = "models.dgcnn-hais-concat-direct-4"
    checkpoint_path: str | None = None
    log_dir: str = "log/gcanet"
    resultsSave: bool = False
    val_skip: int = 5
    train_skip: int = 1
    data_path: str = "/opt/data/common/ABC/"
    dataset: str = "ABC"
    train_dataset: str = "train_data.txt"
    test_dataset: str = "test_data.txt"
    batch_size: int = 3
    eval: bool = False
    debug: bool = False
    MEAN_SHIFT_STEP: int = 5

    # --- training parameters (option_new.py:78-146) ---
    max_epoch: int = 200
    learning_rate: float = 1e-3
    optimizer: str = "adam"
    weight_decay: float = 0.0
    momentum: float = 0.9
    lr_decay_steps: str = "20,30,40"
    lr_decay_rates: str = "0.1,0.1,0.1"
    lr_decay_rate: float = 0.1
    loss_class: str = "frpn"          # f: embedding, r: type+offset+instance, p: param, n: normal
    train_fold: int = 1
    eval_interval: int = 1
    save_interval: int = 2
    augment: int = 0
    if_normal_noise: int = 0

    # --- model parameters (option_new.py:153-216) ---
    not_load_model: bool = False
    sigma: float = 0.8
    normal_sigma: float = 0.1
    out_dim: int = 64
    type_weight: float = 2.0
    param_weight: float = 0.1
    normal_weight: float = 1.0
    edge_knn: int = 50
    feat_ent_weight: float = 1.70
    dis_ent_weight: float = 1.10
    edge_ent_weight: float = 1.23
    topK: int = 10
    edge_topK: int = 12
    bandwidth: float = 0.85
    backbone: str = "DGCNN"

    # --- TPU-native static-shape / perf knobs (new) ---
    num_points: int = 7000            # N per cloud (ABCDataset_new.py:120 subsample)
    # Encoder/embedding graph degree K (reference: dgcnn-4.py:545 nn_nb=80).
    # TPU default 48: the [B,N,K,C] edge gathers/scatters are the step's
    # index-count-bound floor, so K scales cost almost linearly — 48 gives
    # +41% step throughput (22.5 vs 16.0 clouds/s) with step-1000 convergence
    # matching K=80 on both the default and hard mixes (BASELINE.md round-2
    # K-sweep).  `--nn_nb 80` restores strict reference parity.
    nn_nb: int = 48
    offset_knn: int = 30              # OFFSET_PRED_MODULE nn_nb (dgcnn-4.py:552)
    offset_keypoints: int = 120       # OFFSET_PRED_MODULE sampling_ratio
    offset_variant: str = "kpam"      # "kpam" (dgcnn-4) | "dual" (dgcnn-2, nn_nb=60)
    max_instances: int = 80           # static pad for GT instances per batch item
    precision: str = "fp32"           # fp32 | bf16 (matmul inputs)
    # kNN search impl: "approx" = lax.approx_max_k (TPU-optimised, recall
    # ~0.95; the encoder consumes neighbourhoods as max-pooled sets so this is
    # behaviourally equivalent and ~6x faster than exact top_k at N=8192);
    # "xla" = exact lax.top_k (parity/testing).
    knn_impl: str = "approx"
    # bf16 compute for the encoder's [B, N, K, C] edge tensors (matmuls are
    # MXU-bf16-rounded either way; this halves the HBM traffic of the GN/
    # activation/max passes and their cotangents).  GroupNorm statistics stay
    # fp32; all [B, N, C] features leave the encoder as fp32.
    encoder_bf16: bool = False
    # Rematerialise edge-conv/offset activations in backward.  Saves ~6 GB of
    # activations at N=8192 (for batch > 8) at ~2x step-time cost — only worth
    # it when memory-bound; measured faster OFF at batch <= 8.
    remat: bool = False
    # Edge-conv gather backward: "scatter" (exact XLA scatter-add VJP) or
    # "revgather:M" (reverse-graph gather with in-degree cap M — drops hub
    # points' surplus gradient contributions; ops/knn.py).  Perf experiment;
    # default stays exact.
    edge_backward: str = "scatter"
    # Reuse the layer-1 position-normal graph for all 3 edge convs instead of
    # per-layer feature-space kNN (the reference's dynamic-graph semantics,
    # dgcnn-4.py:497-503).  Saves 2 kNN searches/step (+1.7% measured) but
    # REJECTED as default: convergence degrades 3/3 runs well outside seed
    # noise (BASELINE.md 2026-08-19) — the dynamic graphs earn their cost.
    shared_graph: bool = False
    # Graph degree for edge convs 2-3 (0 = nn_nb; clamped to nn_nb).
    # Neighbour lists are nearest-first, so under shared_graph this slices the
    # layer-1 graph; with per-layer graphs it lowers the inner kNN's k.  The
    # inner layers' gathers/scatters are the step's cost floor and scale
    # linearly in this.  Default 32: +17.3% paired throughput (27.13 vs
    # 23.12 clouds/s at B=10/N=8192/K=48).  History: the 1000-step hard-mix
    # gates showed a reproducible type-mIoU d=-0.053 (2 seeds) and the
    # provisional default was reverted; the 3000-step JOINT tuned-vs-strict
    # A/B (BASELINE.md round-3 session 2) then showed that gap is a
    # transient — at plateau the full tuned stack matches the full strict
    # stack within noise on the hard mix (0.923/0.988 vs 0.935/0.986 at the
    # last common step 2250) and reaches type-mIoU 1.000 on BOTH mixes by
    # step 2500, so 32 was RE-ADOPTED on long-horizon evidence per the
    # criterion documented at the revert.  --nn_nb_inner 0 = uniform-K
    # strict parity (dgcnn-4.py:545 semantics).
    nn_nb_inner: int = 32
    mesh_shape: str = "1"             # data-parallel devices, e.g. "8"
    seed: int = 0
    # ScanNetEval min region size (scene family): 0 = auto (reference
    # default 100 on real datasets, 1 on tiny synthetic scenes);
    # softgroup/evaluation/instance_eval.py:25-28
    eval_min_npoint: int = 0
    # bf16 compute in the scene-family backbone U-Net (dense-conv FLOP/HBM
    # bound, unlike the ABC family's index-bound edge path).  Default ON:
    # +20.6% throughput (19.50 vs 16.17 clouds/s) and the 2-seed convergence
    # A/B matched the fp32 plateau (sem-mIoU ~0.95, AP50 0.667 from step 750
    # on both; BASELINE.md 2026-08-20).  --scene_bf16 0 = strict fp32.
    scene_bf16: bool = True
    # Scene family: SoftGroup's staged training (softgroup.py:24,72,93).
    # semantic_only=True builds only the backbone + semantic/offset heads
    # (no grouping/instance branch); stage 2 resumes the stage-1 checkpoint
    # into the full model (key-intersection load) with the stage-1 modules
    # frozen via fixed_modules.
    semantic_only: bool = False
    # Comma-separated top-level scene-model param groups to freeze (zero
    # grads + frozen batch_stats — the reference freezes requires_grad and
    # pins BN to eval mode, softgroup.py:83-86,100-105).  The reference's
    # stage-2 recipe: "input_conv,unet,output_layer,semantic_linear,
    # offset_linear".
    fixed_modules: str = ""
    # S3DIS eval protocol (softgroup.py:380-411 forward_4_parts/
    # merge_4_parts): run the backbone over the scene's 4 point-interleaved
    # parts ([p::4]) as a batch of 4, re-interleave, then group over the
    # full scene.  Test-time only.
    x4_split: bool = False
    # Scene family grouping semantics.  True = the vendored SoftGroup's SOFT
    # per-class subsets (``scores > score_thr``, softgroup.py:437 — one point
    # may join several classes' clusterings; reference-faithful, the paper's
    # contribution).  False = the ABC-style argmax partition (one clustering
    # channel; C x cheaper CC).  COMPONENTS.md deviation #7 closure.
    scene_soft_grouping: bool = True

    grouping: GroupingConfig = dataclasses.field(default_factory=GroupingConfig)
    instance_head: InstanceHeadConfig = dataclasses.field(default_factory=InstanceHeadConfig)

    @property
    def lr_decay_step_list(self) -> Tuple[int, ...]:
        return tuple(int(x) for x in str(self.lr_decay_steps).split(","))

    @property
    def lr_decay_rate_list(self) -> Tuple[float, ...]:
        return tuple(float(x) for x in str(self.lr_decay_rates).split(","))

    @property
    def input_channels(self) -> int:
        return 6 if self.mode == 5 else 3

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def bench_config() -> Config:
    """The ONE bench workload config, from GCA_BENCH_* env knobs.

    Shared by bench.py, tools/profile_step.py and tools/dump_hlo.py so a
    profile/HLO dump always describes the same program the headline bench
    measured (the three had already diverged once: profile defaulted B=8
    while the bench ran B=10, and only the bench honoured GCA_BENCH_NN).

    Knobs: GCA_BENCH_BATCH (10), GCA_BENCH_POINTS (8192),
    GCA_BENCH_PROPOSALS (0 = InstanceHeadConfig default),
    GCA_BENCH_ENC_BF16 (0), GCA_BENCH_NN (0 = Config default),
    GCA_BENCH_MESH (1 = single device; N>1 = data-parallel mesh over N
    devices, batch is the GLOBAL batch),
    GCA_BENCH_GROUP_VMAP (0; 1 = batched grouping/CC sweeps across items),
    GCA_BENCH_EDGE_BWD (scatter | revgather:M — edge-conv gather backward),
    GCA_BENCH_SHARED_GRAPH (0; 1 = one graph for all 3 edge convs),
    GCA_BENCH_NN_INNER (unset = Config default; 0 = nn_nb-uniform;
    graph degree for edge convs 2-3),
    GCA_BENCH_CC_PALLAS (unset = auto: pallas on TPU; 1 = pallas int8,
    0 = xla),
    GCA_BENCH_KNN (unset = Config default; 'xla' = exact lax.top_k,
    'approx:R' = recall-R approx_max_k — the strict-parity line runs 'xla').
    bench.py additionally reads GCA_BENCH_ITERS (10, timed steps),
    GCA_BENCH_FAMILY (abc | scene), GCA_BENCH_SCENE_GRID (64) and
    GCA_BENCH_SCENE_SOFT (1 = SoftGroup soft per-class grouping, the scene
    default; 0 = argmax partition).
    """
    import os

    props = int(os.environ.get("GCA_BENCH_PROPOSALS", "0"))
    nn_nb = int(os.environ.get("GCA_BENCH_NN", "0"))
    group_vmap = bool(int(os.environ.get("GCA_BENCH_GROUP_VMAP", "0")))
    cc_impl = {"1": "pallas", "0": "xla"}.get(
        os.environ.get("GCA_BENCH_CC_PALLAS", ""), "auto")
    return Config(
        num_points=int(os.environ.get("GCA_BENCH_POINTS", "8192")),
        batch_size=int(os.environ.get("GCA_BENCH_BATCH", "10")),
        max_instances=48,
        encoder_bf16=bool(int(os.environ.get("GCA_BENCH_ENC_BF16", "0"))),
        edge_backward=os.environ.get("GCA_BENCH_EDGE_BWD", "scatter"),
        shared_graph=bool(int(os.environ.get("GCA_BENCH_SHARED_GRAPH", "0"))),
        **({"nn_nb_inner": int(os.environ["GCA_BENCH_NN_INNER"])}
           if "GCA_BENCH_NN_INNER" in os.environ else {}),
        **({"knn_impl": os.environ["GCA_BENCH_KNN"]}
           if "GCA_BENCH_KNN" in os.environ else {}),
        mesh_shape=os.environ.get("GCA_BENCH_MESH", "1"),
        scene_soft_grouping=bool(int(
            os.environ.get("GCA_BENCH_SCENE_SOFT", "1"))),
        grouping=GroupingConfig(
            item_batch_mode="vmap" if group_vmap else "map",
            cc_impl=cc_impl),
        instance_head=(InstanceHeadConfig(max_proposals=props) if props
                       else InstanceHeadConfig()),
        **({"nn_nb": nn_nb} if nn_nb else {}))


def _add_args(parser: argparse.ArgumentParser) -> None:
    """Register every option_new.py flag plus the TPU extras."""
    c = Config()
    p = parser.add_argument
    p("--num_primitives", type=int, default=c.num_primitives)
    p("--mode", type=int, default=c.mode)
    p("--ablation", type=bool, default=c.ablation)
    p("--using_set_aggr", type=bool, default=c.using_set_aggr)
    p("--model_dict", type=str, default=c.model_dict)
    p("--checkpoint_path", default=c.checkpoint_path)
    p("--log_dir", default=c.log_dir)
    p("--resultsSave", type=bool, default=c.resultsSave)
    p("--val_skip", type=int, default=c.val_skip)
    p("--train_skip", type=int, default=c.train_skip)
    p("--data_path", type=str, default=c.data_path)
    p("--dataset", type=str, default=c.dataset)
    p("--train_dataset", type=str, default=c.train_dataset)
    p("--test_dataset", type=str, default=c.test_dataset)
    p("--batch_size", type=int, default=c.batch_size)
    p("--vis", action="store_true")
    p("--vis_dir", type=str, default=None)
    p("--eval", action="store_true")
    p("--debug", action="store_true")
    p("--MEAN_SHIFT_STEP", type=int, default=c.MEAN_SHIFT_STEP)
    p("--max_epoch", type=int, default=c.max_epoch)
    p("--learning_rate", type=float, default=c.learning_rate)
    p("--optimizer", type=str, default=c.optimizer)
    p("--weight_decay", type=float, default=c.weight_decay)
    p("--momentum", type=float, default=c.momentum)
    p("--bn_decay_step", type=int, default=20)
    p("--bn_decay_rate", type=float, default=0.5)
    p("--lr_decay_steps", default=c.lr_decay_steps)
    p("--lr_decay_rates", default=c.lr_decay_rates)
    p("--lr_decay_rate", type=float, default=c.lr_decay_rate)
    p("--loss_class", type=str, default=c.loss_class)
    p("--train_fold", type=int, default=c.train_fold)
    p("--eval_interval", type=int, default=c.eval_interval)
    p("--save_interval", type=int, default=c.save_interval)
    p("--augment", type=int, default=c.augment)
    p("--if_normal_noise", type=int, default=c.if_normal_noise)
    p("--optimize", type=int, default=0)
    p("--gpu", type=str, default="0")
    p("--not_load_model", action="store_true")
    p("--sigma", type=float, default=c.sigma)
    p("--normal_sigma", type=float, default=c.normal_sigma)
    p("--out_dim", type=int, default=c.out_dim)
    p("--type_weight", type=float, default=c.type_weight)
    p("--param_weight", type=float, default=c.param_weight)
    p("--normal_weight", type=float, default=c.normal_weight)
    p("--edge_knn", type=int, default=c.edge_knn)
    p("--feat_ent_weight", type=float, default=c.feat_ent_weight)
    p("--dis_ent_weight", type=float, default=c.dis_ent_weight)
    p("--edge_ent_weight", type=float, default=c.edge_ent_weight)
    p("--topK", type=int, default=c.topK)
    p("--edge_topK", type=int, default=c.edge_topK)
    p("--bandwidth", type=float, default=c.bandwidth)
    p("--backbone", type=str, default=c.backbone)
    # TPU extras
    p("--num_points", type=int, default=c.num_points)
    p("--nn_nb", type=int, default=c.nn_nb)
    p("--max_instances", type=int, default=c.max_instances)
    p("--precision", type=str, default=c.precision)
    p("--knn_impl", type=str, default=c.knn_impl)
    p("--encoder_bf16", type=int, default=int(c.encoder_bf16))
    p("--edge_backward", type=str, default=c.edge_backward)
    p("--shared_graph", type=int, default=int(c.shared_graph))
    p("--nn_nb_inner", type=int, default=c.nn_nb_inner)
    p("--mesh_shape", type=str, default=c.mesh_shape)
    p("--seed", type=int, default=c.seed)
    p("--eval_min_npoint", type=int, default=c.eval_min_npoint)
    p("--scene_bf16", type=int, default=int(c.scene_bf16))
    p("--semantic_only", type=int, default=int(c.semantic_only))
    p("--fixed_modules", type=str, default=c.fixed_modules)
    p("--x4_split", type=int, default=int(c.x4_split))
    p("--scene_soft_grouping", type=int, default=int(c.scene_soft_grouping),
      help="scene family: 1 = vendored SoftGroup soft per-class subsets "
           "(softgroup.py:437, reference-faithful); 0 = argmax partition")
    p("--ignore_classes", type=str, default="",
      help="scene family: comma-separated class ids excluded from grouping "
           "(softgroup.py:434 grouping_cfg.ignore_classes)")
    p("--max_proposals", type=int, default=c.instance_head.max_proposals,
      help="train-time proposal cap (reference parity: 200; TPU default 100)")
    p("--strict_caps", type=int, default=0,
      help="replicate the CUDA grouping buffer caps (bfs_cluster.cu:30 "
           "3000-neighbour lists; hierarchical_aggregation.cu:9-11 1000 "
           "fragments / 3000 absorbed points per primary). Off by default: "
           "production densities never reach them (tests/test_grouping_caps)")


def config_from_namespace(ns: argparse.Namespace) -> Config:
    c = Config()
    fields = {f.name for f in dataclasses.fields(Config)}
    updates = {k: v for k, v in vars(ns).items() if k in fields and v is not None}
    c = c.replace(**updates)
    mp = getattr(ns, "max_proposals", None)
    if mp is not None and mp != c.instance_head.max_proposals:
        c = c.replace(instance_head=dataclasses.replace(
            c.instance_head, max_proposals=mp))
    if getattr(ns, "strict_caps", 0):
        c = c.replace(grouping=dataclasses.replace(
            c.grouping, neighbor_cap=3000, absorb_fragment_cap=1000,
            absorb_point_cap=3000))
    # scene family: swap the ABC grouping constants for the SoftGroup
    # scannetv2 recipe (an explicit --ignore_classes below still wins)
    from gcanet_tpu.models.registry import is_scene_model

    if is_scene_model(c.model_dict):
        c = c.replace(grouping=scene_grouping_defaults(c.grouping))
    ig = getattr(ns, "ignore_classes", "") or ""
    if ig.strip():
        c = c.replace(grouping=dataclasses.replace(
            c.grouping,
            ignore_classes=tuple(int(x) for x in ig.split(",") if x.strip())))
    c = c.replace(scene_soft_grouping=bool(c.scene_soft_grouping))
    return c


def build_option(argv=None) -> Config:
    """Drop-in analogue of option_new.py:218-220 returning a Config."""
    parser = argparse.ArgumentParser()
    _add_args(parser)
    ns = parser.parse_args(argv)
    return config_from_namespace(ns)
