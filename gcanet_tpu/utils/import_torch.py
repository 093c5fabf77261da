"""Torch-checkpoint -> flax parameter-tree converter for the flagship model.

The reference trains ``PrimitiveNet`` (models/dgcnn-hais-concat-direct-4.py:
1395) and checkpoints ``{epoch, model_state_dict, optimizer_state_dict}``
via torch.save (trainer_new.py:420-445); this module maps that state_dict
onto ``gcanet_tpu.models.primitive_net.PrimitiveNet``'s flax tree so a
reference-trained model can be evaluated (or fine-tuned) here without
retraining.

Layout conventions handled:
  * Conv1d/Conv2d(kernel=1) [out, in, 1(,1)]  -> Dense kernel [in, out]
  * Linear [out, in]                          -> Dense kernel [in, out]
  * GroupNorm/BatchNorm weight/bias           -> scale/bias (+ batch_stats
    mean/var from running_mean/running_var)
  * spconv SubMConv3d / SparseConv3d kernels  -> flax Conv [k,k,k,in,out];
    both spconv-1.x ([k,k,k,in,out]) and spconv-2.x ([out,k,k,k,in]) layouts
    are detected by shape
  * Custom1x1Subm3d (blocks.py:31-41)         -> Dense kernel (the reference
    forward does ``features @ weight.view(out,in).T``)
  * the decomposed EdgeConv (gcanet_tpu/models/dgcnn.py:20-47) consumes the
    reference's [2C, C_out] edge-conv matrix unchanged: reference edge
    features are ``[x_j - x_i ; x_i]`` (dgcnn-4.py:117) and the decomposition
    reproduces exactly that product, so the converted kernel is just the
    conv2d transpose.

Known non-mapped reference keys (returned in ``report.skipped``):
  * ``mlp_squeeze_output_feature`` / ``bn_normal_squeeze_output_feature`` —
    dead parameters; their only use is commented out (dgcnn-4.py:911).
  * duplicate Sequential registrations of shared GroupNorms
    (``encoder.conv1.1`` is the same tensor as ``encoder.bn1`` etc.).
  * ``num_batches_tracked`` counters.
  * The inverse-conv (``tiny_unet.deconv.2``) maps through DECONV3D: flax's
    ``ConvTranspose`` (lax.conv_transpose) applies MIRRORED kernel taps
    relative to torch/spconv's inverse convolution, so the kernel is
    spatially flipped on import (and unflipped on export).  With the flip
    the dense U-Net matches the reference's sparse one to float rounding at
    active sites (tests/test_reference_instance_path_parity.py, which runs
    the reference's real blocks.py UBlock on a CPU spconv emulation).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# mapping table
# ---------------------------------------------------------------------------

# transform kinds
LINEAR = "linear"          # [out,in] -> [in,out]
CONV1X1 = "conv1x1"        # [out,in,1(,1)] -> [in,out]
NORM = "norm"              # weight->scale, bias->bias (GN or BN affine)
BN_STATS = "bn_stats"      # running_mean->mean, running_var->var
CONV3D = "conv3d"          # spconv layouts -> [k,k,k,in,out]
DECONV3D = "deconv3d"      # inverse conv -> flax ConvTranspose: + spatial flip
SUBM1X1 = "subm1x1"        # Custom1x1Subm3d -> Dense [in,out]


@dataclasses.dataclass
class Rule:
    torch_prefix: str        # reference module path (state_dict key prefix)
    flax_path: Tuple[str, ...]
    kind: str
    has_bias: bool = False


def _res_block_rules(tprefix: str, fprefix: Tuple[str, ...],
                     with_identity: bool = False) -> List[Rule]:
    """softgroup/model/blocks.py:44-79 ResidualBlock ->
    gcanet_tpu/models/instance_head.py ResidualBlock."""
    rules = [
        Rule(f"{tprefix}.conv_branch.0", fprefix + ("MaskedBatchNorm_0",), NORM),
        Rule(f"{tprefix}.conv_branch.0", fprefix + ("MaskedBatchNorm_0",), BN_STATS),
        Rule(f"{tprefix}.conv_branch.2",
             fprefix + ("SubMConv3d_0", "Conv_0"), CONV3D),
        Rule(f"{tprefix}.conv_branch.3", fprefix + ("MaskedBatchNorm_1",), NORM),
        Rule(f"{tprefix}.conv_branch.3", fprefix + ("MaskedBatchNorm_1",), BN_STATS),
        Rule(f"{tprefix}.conv_branch.5",
             fprefix + ("SubMConv3d_1", "Conv_0"), CONV3D),
    ]
    if with_identity:
        rules.append(Rule(f"{tprefix}.i_branch.0",
                          fprefix + ("Dense_0",), SUBM1X1))
    return rules


def _encoder_rules(enc: Tuple[str, ...]) -> List[Rule]:
    """DGCNNEncoderGn key map (dgcnn-4.py:455-534; identical compute in
    sppnet.py:148-225 — only the return contract differs)."""
    return [
        Rule("encoder.conv1.0", enc + ("ConvGNAct_0", "Dense_0"), CONV1X1),
        Rule("encoder.bn1", enc + ("ConvGNAct_0", "GroupNorm_0"), NORM),
        Rule("encoder.conv2.0", enc + ("EdgeConv_0",), CONV1X1),
        Rule("encoder.bn2", enc + ("EdgeConv_0", "GroupNorm_0"), NORM),
        Rule("encoder.conv3.0", enc + ("EdgeConv_1",), CONV1X1),
        Rule("encoder.bn3", enc + ("EdgeConv_1", "GroupNorm_0"), NORM),
        Rule("encoder.mlp1", enc + ("DenseGN_0", "Dense_0"), CONV1X1, True),
        Rule("encoder.bnmlp1", enc + ("DenseGN_0", "GroupNorm_0"), NORM),
    ]


def build_rules(mode: int = 5, model: str = "flagship") -> List[Rule]:
    """The complete key map for the reference checkpoint families:

    * ``flagship`` — models/dgcnn-hais-concat-direct-4.py (mode-5 default)
      -> gcanet_tpu.models.primitive_net.PrimitiveNet
    * ``sppnet``   — models/sppnet.py PrimitivesEmbeddingDGCNGn (mode 5)
      -> gcanet_tpu.models.sppnet.PrimitiveNetSPP
    * ``splinenet`` — models/splinenet.py DGCNNControlPoints (the
      open/closed-spline nets abc_utils.py:34-61 loads)
      -> gcanet_tpu.models.splinenet.DGCNNControlPoints
    """
    if model == "sppnet":
        return _sppnet_rules()
    if model == "splinenet":
        return _splinenet_rules()
    if model == "variant2":
        return _variant2_rules()
    assert model == "flagship", f"unknown model family {model!r}"
    assert mode == 5, "only the mode-5 flagship map is implemented"
    enc = ("DGCNNEncoderGn_0",)
    ih = ("InstanceHead_0",)
    tu = ih + ("TinyUNet_0",)
    rules: List[Rule] = _encoder_rules(enc) + [
        # trunk + heads (dgcnn-4.py:544-603, 644-699)
        Rule("conv1", ("DenseGN_0", "Dense_0"), CONV1X1, True),
        Rule("bn1", ("DenseGN_0", "GroupNorm_0"), NORM),
        Rule("conv2", ("DenseGN_1", "Dense_0"), CONV1X1, True),
        Rule("bn2", ("DenseGN_1", "GroupNorm_0"), NORM),
        Rule("mlp_prim_prob1", ("DenseGN_2", "Dense_0"), CONV1X1, True),
        Rule("bn_prim_prob1", ("DenseGN_2", "GroupNorm_0"), NORM),
        Rule("mlp_prim_prob2", ("Dense_0",), CONV1X1, True),
        Rule("mlp_param_prob1", ("DenseGN_3", "Dense_0"), CONV1X1, True),
        Rule("bn_param_prob1", ("DenseGN_3", "GroupNorm_0"), NORM),
        Rule("mlp_param_prob2", ("Dense_1",), CONV1X1, True),
        Rule("mlp_seg_prob1", ("DenseGN_4", "Dense_0"), CONV1X1, True),
        Rule("bn_seg_prob1", ("DenseGN_4", "GroupNorm_0"), NORM),
        Rule("mlp_seg_prob2", ("Dense_2",), CONV1X1, True),
        Rule("conv_normal.0", ("ConvGNAct_0", "Dense_0"), CONV1X1),
        Rule("bn_normal", ("ConvGNAct_0", "GroupNorm_0"), NORM),
        Rule("conv3", ("DenseGN_5", "Dense_0"), CONV1X1, True),
        Rule("bn3", ("DenseGN_5", "GroupNorm_0"), NORM),
        # offset module (dgcnn-4.py:351-452)
        Rule("offset_pred_block.conv1.0",
             ("OffsetPredModule_0", "ConvGNAct_0", "Dense_0"), CONV1X1),
        Rule("offset_pred_block.bn1",
             ("OffsetPredModule_0", "ConvGNAct_0", "GroupNorm_0"), NORM),
        Rule("offset_pred_block.attention.conv1.0",
             ("OffsetPredModule_0", "KPAM_0", "Dense_0"), CONV1X1),
        Rule("offset_pred_block.attention.conv1.2",
             ("OffsetPredModule_0", "KPAM_0", "Dense_1"), CONV1X1),
        Rule("offset_pred_block.mlp_offset",
             ("OffsetPredModule_0", "Dense_0"), CONV1X1, True),
        # instance head linears (dgcnn-4.py:611-615)
        Rule("cls_linear", ih + ("Dense_0",), LINEAR, True),
        Rule("iou_score_linear", ih + ("Dense_1",), LINEAR, True),
        Rule("mask_linear.0", ih + ("MLP_0", "Dense_0"), LINEAR, True),
        Rule("mask_linear.2", ih + ("MLP_0", "Dense_1"), LINEAR, True),
        Rule("tiny_unet_outputlayer.0", ih + ("MaskedBatchNorm_0",), NORM),
        Rule("tiny_unet_outputlayer.0", ih + ("MaskedBatchNorm_0",), BN_STATS),
        # tiny U-Net: UBlock([64,128], reps=2) (blocks.py:82-143)
        Rule("tiny_unet.conv.0", tu + ("MaskedBatchNorm_0",), NORM),
        Rule("tiny_unet.conv.0", tu + ("MaskedBatchNorm_0",), BN_STATS),
        Rule("tiny_unet.conv.2", tu + ("Conv_0",), CONV3D),
        Rule("tiny_unet.deconv.0", tu + ("MaskedBatchNorm_1",), NORM),
        Rule("tiny_unet.deconv.0", tu + ("MaskedBatchNorm_1",), BN_STATS),
        Rule("tiny_unet.deconv.2", tu + ("ConvTranspose_0",), DECONV3D),
    ]
    for i, fname in enumerate(["ResidualBlock_0", "ResidualBlock_1"]):
        rules += _res_block_rules(f"tiny_unet.blocks.block{i}", tu + (fname,))
    for i, fname in enumerate(["ResidualBlock_2", "ResidualBlock_3"]):
        rules += _res_block_rules(f"tiny_unet.u.blocks.block{i}", tu + (fname,))
    rules += _res_block_rules("tiny_unet.blocks_tail.block0",
                              tu + ("ResidualBlock_4",), with_identity=True)
    rules += _res_block_rules("tiny_unet.blocks_tail.block1",
                              tu + ("ResidualBlock_5",))
    return rules


def _sppnet_rules() -> List[Rule]:
    """sppnet.py:228-349 (mode-5 HPNet-style baseline) ->
    gcanet_tpu/models/sppnet.py::PrimitiveNetSPP.

    Head order in our module: embedding (DenseGN_2/Dense_0), type
    (DenseGN_3/Dense_1), normal (DenseGN_4/Dense_2), param
    (DenseGN_5/Dense_3)."""
    return _encoder_rules(("DGCNNEncoderGn_0",)) + [
        Rule("conv1", ("DenseGN_0", "Dense_0"), CONV1X1, True),
        Rule("bn1", ("DenseGN_0", "GroupNorm_0"), NORM),
        Rule("conv2", ("DenseGN_1", "Dense_0"), CONV1X1, True),
        Rule("bn2", ("DenseGN_1", "GroupNorm_0"), NORM),
        Rule("mlp_seg_prob1", ("DenseGN_2", "Dense_0"), CONV1X1, True),
        Rule("bn_seg_prob1", ("DenseGN_2", "GroupNorm_0"), NORM),
        Rule("mlp_seg_prob2", ("Dense_0",), CONV1X1, True),
        Rule("mlp_prim_prob1", ("DenseGN_3", "Dense_0"), CONV1X1, True),
        Rule("bn_prim_prob1", ("DenseGN_3", "GroupNorm_0"), NORM),
        Rule("mlp_prim_prob2", ("Dense_1",), CONV1X1, True),
        Rule("mlp_normal_prob1", ("DenseGN_4", "Dense_0"), CONV1X1, True),
        Rule("bn_normal_prob1", ("DenseGN_4", "GroupNorm_0"), NORM),
        Rule("mlp_normal_prob2", ("Dense_2",), CONV1X1, True),
        Rule("mlp_param_prob1", ("DenseGN_5", "Dense_0"), CONV1X1, True),
        Rule("bn_param_prob1", ("DenseGN_5", "GroupNorm_0"), NORM),
        Rule("mlp_param_prob2", ("Dense_3",), CONV1X1, True),
    ]


def _variant2_rules() -> List[Rule]:
    """models/dgcnn-hais-concat-direct-2.py checkpoints -> our PrimitiveNet
    with ``offset_variant='dual'``.  Identical to the flagship map except the
    offset module: dual sigmoid-KPAM over geometric keypoint neighbourhoods
    (dgcnn-2.py:326-466); the seg-attention branch is dead code (its only use
    is commented out at dgcnn-2.py:447) and lands in report.skipped."""
    base = [r for r in build_rules(5, "flagship")
            if not r.torch_prefix.startswith("offset_pred_block")]
    od = ("OffsetPredModuleDual_0",)
    return base + [
        Rule("offset_pred_block.conv1.0", od + ("ConvGNAct_0", "Dense_0"),
             CONV1X1),
        Rule("offset_pred_block.bn1", od + ("ConvGNAct_0", "GroupNorm_0"),
             NORM),
        Rule("offset_pred_block.attention_inst.conv1.0",
             od + ("KPAMSigmoid_0", "Dense_0"), CONV1X1),
        Rule("offset_pred_block.attention_inst.conv1.2",
             od + ("KPAMSigmoid_0", "Dense_1"), CONV1X1),
        Rule("offset_pred_block.mlp_offset", od + ("Dense_0",), CONV1X1,
             True),
    ]


def _splinenet_rules() -> List[Rule]:
    """splinenet.py:55-179 DGCNNControlPoints (both modes share key names) ->
    gcanet_tpu/models/splinenet.py::DGCNNControlPoints."""
    rules: List[Rule] = []
    for i in range(4):
        blk = (f"_EdgeBlock_{i}",)
        rules += [
            Rule(f"conv{i + 1}.0", blk + ("Dense_0",), CONV1X1),
            Rule(f"bn{i + 1}", blk + ("BatchNorm_0",), NORM),
            Rule(f"bn{i + 1}", blk + ("BatchNorm_0",), BN_STATS),
        ]
    rules += [
        Rule("conv5.0", ("Dense_0",), CONV1X1),
        Rule("bn5", ("BatchNorm_0",), NORM),
        Rule("bn5", ("BatchNorm_0",), BN_STATS),
        Rule("conv6", ("Dense_1",), CONV1X1, True),
        Rule("bn6", ("BatchNorm_1",), NORM),
        Rule("bn6", ("BatchNorm_1",), BN_STATS),
        Rule("conv7", ("Dense_2",), CONV1X1, True),
        Rule("bn7", ("BatchNorm_2",), NORM),
        Rule("bn7", ("BatchNorm_2",), BN_STATS),
        Rule("conv8", ("Dense_3",), CONV1X1, True),
    ]
    return rules


# keys that are known duplicates / dead weights — not errors when left over
_EXPECTED_SKIPS = (
    "mlp_squeeze_output_feature", "bn_normal_squeeze_output_feature",
    "encoder.conv1.1", "encoder.conv2.1", "encoder.conv3.1",
    "conv_normal.1", "offset_pred_block.conv1.1",
    "num_batches_tracked", "tiny_unet_outputlayer.1",
    # declared but never applied in the reference forward (dgcnn-4.py:464-465
    # create bn4/bn5; only bn1-3 + bnmlp1 are used) — dead params every real
    # checkpoint carries
    "encoder.bn4", "encoder.bn5",
)

# per-family expected skips (duplicate Sequential registrations of the shared
# norms, dead bn4/bn5, BN counters)
_MODEL_SKIPS = {
    "flagship": _EXPECTED_SKIPS,
    "sppnet": _EXPECTED_SKIPS,
    "variant2": _EXPECTED_SKIPS + ("attention_seg",),
    "splinenet": ("conv1.1", "conv2.1", "conv3.1", "conv4.1", "conv5.1",
                  "num_batches_tracked"),
}


# ---------------------------------------------------------------------------
# tensor transforms
# ---------------------------------------------------------------------------

def _to_dense_kernel(w: np.ndarray) -> np.ndarray:
    """Conv1d/Conv2d(k=1)/Linear weight -> Dense kernel [in, out]."""
    w = np.asarray(w)
    while w.ndim > 2:
        assert w.shape[-1] == 1, f"not a 1x1 conv: {w.shape}"
        w = w[..., 0]
    return w.T


def _to_conv3d_kernel(w: np.ndarray, target_shape: Tuple[int, ...]) -> np.ndarray:
    """spconv weight -> flax Conv kernel [kD,kH,kW,in,out]."""
    w = np.asarray(w)
    assert w.ndim == 5, f"expected 5-d conv kernel, got {w.shape}"
    candidates = [
        (0, 1, 2, 3, 4),   # spconv 1.x: [k,k,k,in,out]
        (1, 2, 3, 4, 0),   # spconv 2.x: [out,k,k,k,in]
        (2, 3, 4, 1, 0),   # torch dense Conv3d: [out,in,k,k,k]
    ]
    for perm in candidates:
        if np.transpose(w, perm).shape == tuple(target_shape):
            return np.transpose(w, perm)
    raise ValueError(f"cannot map conv kernel {w.shape} -> {target_shape}")


def _to_subm1x1_kernel(w: np.ndarray) -> np.ndarray:
    """Custom1x1Subm3d weight -> Dense kernel [in, out].

    The reference forward is ``features @ weight.view(out, in).T``
    (blocks.py:34), so whatever the storage layout, view(out,in).T is the
    effective matrix."""
    w = np.asarray(w)
    out = w.shape[0] if w.shape[0] != 1 else w.shape[-1]
    return w.reshape(out, -1).T


# ---------------------------------------------------------------------------
# conversion driver
# ---------------------------------------------------------------------------

def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):            # nn.DataParallel wrap
            k = k[len("module."):]
        if k.startswith("affinitynet."):       # PrimitiveNet.affinitynet
            k = k[len("affinitynet."):]
        out[k] = np.asarray(v)
    return out


def _set_path(tree: Dict, path: Tuple[str, ...], leaf_name: str,
              value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


@dataclasses.dataclass
class ConvertReport:
    mapped: List[str]
    skipped: List[str]          # expected skips (dead/dup keys)
    unmatched: List[str]        # reference keys we did NOT understand
    missing: List[str]          # flax params NOT covered by the checkpoint


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       params_template, batch_stats_template,
                       mode: int = 5, model: str = "flagship"):
    """Map a reference model_state_dict onto (params, batch_stats).

    Returns ``(params, batch_stats, report)``. Unmapped flax params keep
    their template values — the reference's own load_checkpoint does the
    same key-intersection partial load (trainer_new.py:129-135).
    ``model`` selects the checkpoint family (see :func:`build_rules`).
    """
    import jax

    sd = _strip_prefixes(state_dict)
    rules = build_rules(mode, model)

    # flatten templates for shape lookup + coverage accounting
    def flat_paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {tuple(p.key for p in path): np.asarray(leaf)
                for path, leaf in flat}

    p_flat = flat_paths(params_template)
    bs_flat = flat_paths(batch_stats_template)

    new_p: Dict = {}
    new_bs: Dict = {}
    mapped_torch: List[str] = []
    mapped_flax: set = set()

    for rule in rules:
        if rule.kind == NORM:
            pairs = [("weight", "scale"), ("bias", "bias")]
        elif rule.kind == BN_STATS:
            pairs = [("running_mean", "mean"), ("running_var", "var")]
        elif rule.kind in (LINEAR, CONV1X1):
            pairs = [("weight", "kernel")] + ([("bias", "bias")]
                                              if rule.has_bias else [])
        else:  # CONV3D / SUBM1X1
            pairs = [("weight", "kernel")]
        for tname, fname in pairs:
            tkey = f"{rule.torch_prefix}.{tname}"
            if tkey not in sd:
                continue
            w = sd[tkey]
            fpath = rule.flax_path + (fname,)
            target = bs_flat if rule.kind == BN_STATS else p_flat
            if fpath not in target:
                raise KeyError(f"mapping bug: {fpath} not in flax template "
                               f"(from {tkey})")
            tshape = target[fpath].shape
            if rule.kind in (LINEAR, CONV1X1) and fname == "kernel":
                w = _to_dense_kernel(w)
            elif rule.kind == CONV3D:
                w = _to_conv3d_kernel(w, tshape)
            elif rule.kind == DECONV3D:
                # lax.conv_transpose applies mirrored taps vs the inverse
                # conv; flip so the dense deconv reproduces spconv's pairing
                w = _to_conv3d_kernel(w, tshape)[::-1, ::-1, ::-1]
            elif rule.kind == SUBM1X1:
                w = _to_subm1x1_kernel(w)
            w = np.asarray(w, dtype=np.float32)
            if w.shape != tshape:
                raise ValueError(
                    f"{tkey} -> {'/'.join(fpath)}: shape {w.shape} != "
                    f"expected {tshape}")
            _set_path(new_bs if rule.kind == BN_STATS else new_p,
                      fpath[:-1], fpath[-1], w)
            mapped_torch.append(tkey)
            mapped_flax.add(fpath)

    # merge over templates (key-intersection partial load)
    def merge(template_flat, new_tree):
        out: Dict = {}
        for path, leaf in template_flat.items():
            node = new_tree
            ok = True
            for p in path:
                if not isinstance(node, dict) or p not in node:
                    ok = False
                    break
                node = node[p]
            _set_path(out, path[:-1], path[-1], node if ok else leaf)
        return out

    params = merge(p_flat, new_p)
    batch_stats = merge(bs_flat, new_bs)

    mapped_set = set(mapped_torch)
    expected_skips = _MODEL_SKIPS[model]
    skipped, unmatched = [], []
    for k in sd:
        if k in mapped_set:
            continue
        (skipped if any(s in k for s in expected_skips)
         else unmatched).append(k)
    missing = ["/".join(p) for p in
               (set(p_flat) | set(bs_flat)) - mapped_flax
               if p[-1] != "count"]
    # params never present in the reference (our grouping/vox path is
    # parameter-free; anything left over is genuinely uncovered)
    report = ConvertReport(sorted(mapped_torch), sorted(skipped),
                           sorted(unmatched), sorted(missing))
    return params, batch_stats, report


# ---------------------------------------------------------------------------
# synthetic reference checkpoint (for tests / --selftest)
# ---------------------------------------------------------------------------

def make_synthetic_state_dict(num_primitives: int = 7, out_dim: int = 64,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """A state_dict with exactly the documented reference shapes
    (trainer_new.py checkpoint of the mode-5 flagship)."""
    rng = np.random.RandomState(seed)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    sd: Dict[str, np.ndarray] = {}

    def conv1x1(name, cin, cout, bias=True, conv2d=False):
        sd[f"{name}.weight"] = t(cout, cin, 1, 1) if conv2d else t(cout, cin, 1)
        if bias:
            sd[f"{name}.bias"] = t(cout)

    def norm(name, c, stats=False):
        sd[f"{name}.weight"] = 1.0 + t(c)
        sd[f"{name}.bias"] = t(c)
        if stats:
            sd[f"{name}.running_mean"] = t(c)
            sd[f"{name}.running_var"] = np.abs(1.0 + t(c))
            sd[f"{name}.num_batches_tracked"] = np.asarray(7)

    def subm3(name, cin, cout, k=3, spconv2=True):
        # emit the spconv-2.x layout [out, k,k,k, in]
        sd[f"{name}.weight"] = (t(cout, k, k, k, cin) if spconv2
                                else t(k, k, k, cin, cout))

    def res_block(prefix, cin, cout, identity=False):
        norm(f"{prefix}.conv_branch.0", cin, stats=True)
        subm3(f"{prefix}.conv_branch.2", cin, cout)
        norm(f"{prefix}.conv_branch.3", cout, stats=True)
        subm3(f"{prefix}.conv_branch.5", cout, cout, spconv2=False)
        if identity:
            sd[f"{prefix}.i_branch.0.weight"] = t(cout, 1, 1, 1, cin)

    # encoder
    conv1x1("encoder.conv1.0", 12, 64, bias=False, conv2d=True)
    norm("encoder.bn1", 64)
    conv1x1("encoder.conv2.0", 128, 64, bias=False, conv2d=True)
    norm("encoder.bn2", 64)
    conv1x1("encoder.conv3.0", 128, 128, bias=False, conv2d=True)
    norm("encoder.bn3", 128)
    conv1x1("encoder.mlp1", 256, 1024)
    norm("encoder.bnmlp1", 1024)
    # trunk/heads
    conv1x1("conv1", 1280, 512)
    norm("bn1", 512)
    conv1x1("conv2", 512, 256)
    norm("bn2", 256)
    conv1x1("mlp_prim_prob1", 256, 256)
    norm("bn_prim_prob1", 256)
    conv1x1("mlp_prim_prob2", 256, num_primitives)
    conv1x1("mlp_param_prob1", 256, 256)
    norm("bn_param_prob1", 256)
    conv1x1("mlp_param_prob2", 256, 22)
    conv1x1("mlp_seg_prob1", 832, 256)
    norm("bn_seg_prob1", 256)
    conv1x1("mlp_seg_prob2", 256, out_dim)
    conv1x1("conv_normal.0", 7, 64, bias=False, conv2d=True)
    norm("bn_normal", 64)
    conv1x1("conv3", 262, 128)
    norm("bn3", 128)
    # offset module
    conv1x1("offset_pred_block.conv1.0", 131, 128, bias=False, conv2d=True)
    norm("offset_pred_block.bn1", 128)
    conv1x1("offset_pred_block.attention.conv1.0", 30, 30, bias=False)
    conv1x1("offset_pred_block.attention.conv1.2", 30, 30, bias=False)
    conv1x1("offset_pred_block.mlp_offset", 256, 3)
    # instance head
    sd["cls_linear.weight"] = t(num_primitives, 64)
    sd["cls_linear.bias"] = t(num_primitives)
    sd["iou_score_linear.weight"] = t(num_primitives, 64)
    sd["iou_score_linear.bias"] = t(num_primitives)
    sd["mask_linear.0.weight"] = t(64, 64)
    sd["mask_linear.0.bias"] = t(64)
    sd["mask_linear.2.weight"] = t(num_primitives, 64)
    sd["mask_linear.2.bias"] = t(num_primitives)
    norm("tiny_unet_outputlayer.0", 64, stats=True)
    # tiny U-Net
    res_block("tiny_unet.blocks.block0", 64, 64)
    res_block("tiny_unet.blocks.block1", 64, 64)
    norm("tiny_unet.conv.0", 64, stats=True)
    subm3("tiny_unet.conv.2", 64, 128, k=2)
    res_block("tiny_unet.u.blocks.block0", 128, 128)
    res_block("tiny_unet.u.blocks.block1", 128, 128)
    norm("tiny_unet.deconv.0", 128, stats=True)
    subm3("tiny_unet.deconv.2", 128, 64, k=2, spconv2=False)
    res_block("tiny_unet.blocks_tail.block0", 128, 64, identity=True)
    res_block("tiny_unet.blocks_tail.block1", 64, 64)
    # dead weights present in real checkpoints
    conv1x1("mlp_squeeze_output_feature", 99 if num_primitives == 7 else 102, 64)
    norm("bn_normal_squeeze_output_feature", 64)
    return {f"affinitynet.{k}": v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# flax -> torch export (the reverse map: train on TPU, eval/serve with the
# reference stack)
# ---------------------------------------------------------------------------

def _from_conv3d_kernel(w: np.ndarray,
                        target_shape: Tuple[int, ...]) -> np.ndarray:
    """flax Conv kernel [kD,kH,kW,in,out] -> the reference's storage layout.

    Inverse of :func:`_to_conv3d_kernel`: both sides scan the SAME candidate
    permutations in the same order and pick the first whose shapes line up,
    so a round trip is exact even when several layouts share a shape."""
    w = np.asarray(w)
    candidates = [
        (0, 1, 2, 3, 4),   # spconv 1.x: [k,k,k,in,out]
        (1, 2, 3, 4, 0),   # spconv 2.x: [out,k,k,k,in]
        (2, 3, 4, 1, 0),   # torch dense Conv3d: [out,in,k,k,k]
    ]
    for perm in candidates:
        if tuple(target_shape[i] for i in perm) == w.shape:
            return np.transpose(w, np.argsort(perm))
    raise ValueError(f"cannot map conv kernel {w.shape} -> {target_shape}")


@dataclasses.dataclass
class ExportReport:
    mapped: List[str]           # torch keys filled from flax params
    defaulted: List[str]        # template keys left at a neutral default
    missing: List[str]          # rule targets absent from the flax tree


def export_state_dict(params, batch_stats, num_primitives: int = 7,
                      out_dim: int = 64, mode: int = 5,
                      model: str = "flagship"):
    """Map (params, batch_stats) onto a reference ``model_state_dict``.

    The exact inverse of :func:`convert_state_dict` for the mode-5 flagship
    (models/dgcnn-hais-concat-direct-4.py:1395): every tensor the importer
    maps is written back through the inverse layout transform, at exactly
    the storage shapes of a real ``checkpoint_eval{N}.tar``
    (trainer_new.py:420-445) as documented by
    :func:`make_synthetic_state_dict`.  Keys the importer skips as dead or
    counters (mlp_squeeze_output_feature, num_batches_tracked, ...) are
    emitted at neutral defaults (zeros / zero counters) so the reference's
    key-intersection ``load_checkpoint`` (trainer_new.py:129-135) accepts
    the file without complaint.

    Returns ``(state_dict, report)`` with the flagship's ``affinitynet.``
    key prefix in place.
    """
    import jax

    assert model == "flagship" and mode == 5, (
        "export implements the mode-5 flagship map (the only family the "
        "reference's trainer checkpoints end-to-end)")
    template = make_synthetic_state_dict(num_primitives, out_dim)
    rules = build_rules(mode, model)

    def flat_paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {tuple(p.key for p in path): np.asarray(leaf)
                for path, leaf in flat}

    p_flat = flat_paths(params)
    bs_flat = flat_paths(batch_stats)

    # neutral defaults for everything (dead weights, counters); rules
    # overwrite the live tensors below
    sd: Dict[str, np.ndarray] = {}
    for k, v in template.items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0, dtype=np.int64)
        elif k.endswith("running_var"):
            sd[k] = np.ones_like(v)
        else:
            sd[k] = np.zeros_like(v)

    mapped: List[str] = []
    missing: List[str] = []
    for rule in rules:
        if rule.kind == NORM:
            pairs = [("weight", "scale"), ("bias", "bias")]
        elif rule.kind == BN_STATS:
            pairs = [("running_mean", "mean"), ("running_var", "var")]
        elif rule.kind in (LINEAR, CONV1X1):
            pairs = [("weight", "kernel")] + ([("bias", "bias")]
                                              if rule.has_bias else [])
        else:  # CONV3D / SUBM1X1
            pairs = [("weight", "kernel")]
        for tname, fname in pairs:
            tkey = f"affinitynet.{rule.torch_prefix}.{tname}"
            if tkey not in sd:
                continue                    # not a checkpointed tensor
            fpath = rule.flax_path + (fname,)
            src = bs_flat if rule.kind == BN_STATS else p_flat
            if fpath not in src:
                missing.append("/".join(fpath))
                continue
            w = src[fpath]
            tshape = sd[tkey].shape
            if rule.kind in (LINEAR, CONV1X1) and fname == "kernel":
                w = w.T.reshape(tshape)
            elif rule.kind == CONV3D:
                w = _from_conv3d_kernel(w, tshape)
            elif rule.kind == DECONV3D:
                w = _from_conv3d_kernel(w[::-1, ::-1, ::-1], tshape)
            elif rule.kind == SUBM1X1:
                w = w.T.reshape(tshape)
            w = np.asarray(w, dtype=np.float32)
            if w.shape != tshape:
                raise ValueError(f"{'/'.join(fpath)} -> {tkey}: shape "
                                 f"{w.shape} != expected {tshape}")
            sd[tkey] = w
            mapped.append(tkey)

    mapped_set = set(mapped)
    defaulted = sorted(k for k in sd if k not in mapped_set)
    return sd, ExportReport(sorted(mapped), defaulted, sorted(missing))


def save_reference_checkpoint(path: str, params, batch_stats, epoch: int = 0,
                              **export_kw) -> "ExportReport":
    """Write a ``checkpoint_eval{N}.tar``-format file the reference's
    ``load_checkpoint`` (trainer_new.py:120-142) restores directly:
    ``torch.save({epoch, model_state_dict, optimizer_state_dict})``."""
    import torch

    sd, report = export_state_dict(params, batch_stats, **export_kw)
    torch.save({"epoch": int(epoch),
                "model_state_dict": {k: torch.from_numpy(np.array(v, copy=True))
                                     for k, v in sd.items()},
                "optimizer_state_dict": {}}, path)
    return report
