"""Differential parity for the instance-head half of the reference model.

Completes the post-CUDA-boundary chain (VERDICT r3 missing #1): with
tests/ref_softgroup_stub.py providing the host ops and
tests/ref_spconv_stub.py emulating spconv, the reference's OWN
``clusters_voxelization`` (dgcnn-4.py:1300-1355) and ``forward_instance``
(:1379-1392, real blocks.py UBlock) run on CPU.  Our
``ops.voxelize.clusters_voxelization`` + ``models.instance_head.InstanceHead``
must match them through the real checkpoint-importer key map at a matched
grid resolution (G=16 on both sides; the 64^3-vs-16^3 default difference
stays the documented deviation #1).
"""

import functools
import pathlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn

import ref_softgroup_stub as ops_stub
import ref_spconv_stub as sps
from test_reference_grouping_parity import (
    _strip_imports, make_trunk_outputs, ours_proposals, ref_proposals)

from gcanet_tpu.config import GroupingConfig
from gcanet_tpu.models.instance_head import InstanceHead
from gcanet_tpu.ops import voxelize as vox_ops
from gcanet_tpu.utils.import_torch import convert_state_dict

REF = pathlib.Path("/root/reference/models/dgcnn-hais-concat-direct-4.py")
BLOCKS = pathlib.Path("/root/reference/softgroup/model/blocks.py")

pytestmark = pytest.mark.skipif(not (REF.exists() and BLOCKS.exists()),
                                reason="reference snapshot not available")

G = 16          # matched grid for the differential (deviation #1 documented)


def load_ref_model_full(using_set_aggr=False, n=96, k=12, with_rle=False):
    """Exec-load blocks.py against the spconv stub, then the model with the
    REAL ResidualBlock/UBlock/MLP and the op stubs — the tiny U-Net is live.

    ``with_rle=True`` also exec-loads the reference's own rle codec
    (softgroup/util/rle.py) so get_instances/merge_masks run for real.
    """
    spmod = sps.module()
    saved = {kk: sys.modules.get(kk) for kk in
             ("spconv", "spconv.pytorch", "spconv.pytorch.modules")}
    sys.modules.update({"spconv": spmod, "spconv.pytorch": spmod.pytorch,
                        "spconv.pytorch.modules": spmod.pytorch.modules})
    try:
        bns = {}
        exec(compile(BLOCKS.read_text(), str(BLOCKS), "exec"), bns)
    finally:
        for kk, v in saved.items():
            if v is None:
                sys.modules.pop(kk, None)
            else:
                sys.modules[kk] = v

    ns = {
        "__file__": str(REF),
        "ResidualBlock": bns["ResidualBlock"], "UBlock": bns["UBlock"],
        "MLP": bns["MLP"], "spconv": spmod,
        "force_fp32": lambda *a, **kw: (lambda f: f),
        "rle_decode": None, "rle_encode": None, "grouping_operation": None,
        "Transformer": None, "knn_point": None, "group_points": None,
        "construction_affinity_matrix_type": None,
        "construction_affinity_matrix_normal": None,
        "construction_affinity_matrix_type_one_class": None,
        "ball_query": ops_stub.ball_query,
        "bfs_cluster": None,
        "hierarchical_aggregation": ops_stub.hierarchical_aggregation,
        "get_mask_iou_on_cluster": ops_stub.get_mask_iou_on_cluster,
        "get_mask_iou_on_pred": ops_stub.get_mask_iou_on_pred,
        "get_mask_label": ops_stub.get_mask_label,
        "global_avg_pool": ops_stub.global_avg_pool,
        "sec_max": ops_stub.sec_max, "sec_min": ops_stub.sec_min,
        "voxelization": ops_stub.voxelization,
        "voxelization_idx": ops_stub.voxelization_idx,
    }
    if with_rle:
        rle_py = pathlib.Path("/root/reference/softgroup/util/rle.py")
        rns = {}
        exec(compile(rle_py.read_text(), str(rle_py), "exec"), rns)
        ns["rle_encode"] = rns["rle_encode"]
        ns["rle_decode"] = rns["rle_decode"]
    src = _strip_imports(REF.read_text())
    src = src.replace("torch.device('cuda')", "torch.device('cpu')")
    src = src.replace(".cuda()", "")
    src = src.replace("device='cuda'", "device='cpu'")
    exec(compile(src, str(REF), "exec"), ns)
    opt = types.SimpleNamespace(loss_class="frpn", ablation=False,
                                using_set_aggr=using_set_aggr)
    torch.manual_seed(7)
    ref = ns["PrimitivesEmbeddingDGCNGn"](
        opt=opt, emb_size=64, num_primitives=7, mode=5, num_channels=6,
        nn_nb=k)
    # non-trivial BN running stats everywhere in the instance path (a fresh
    # BN in eval mode is affine-identity and would hide norm bugs)
    gen = torch.Generator().manual_seed(13)
    for mod in list(ref.tiny_unet.modules()) + list(
            ref.tiny_unet_outputlayer.modules()):
        if isinstance(mod, nn.BatchNorm1d):
            with torch.no_grad():
                mod.running_mean.normal_(0.0, 0.5, generator=gen)
                mod.running_var.uniform_(0.5, 2.0, generator=gen)
                mod.weight.normal_(1.0, 0.2, generator=gen)
                mod.bias.normal_(0.0, 0.2, generator=gen)
    ref.eval()
    return ref


def _scenario(max_proposals=16):
    """B=1 scenario (the reference's within-item proposal ids make its
    flat gathers wrong for items b>0 — documented in
    test_reference_grouping_parity; B=1 sidesteps it so the voxelization
    comparison is apples-to-apples)."""
    xyz, cls, sem, offsets, emb, param = make_trunk_outputs(b=2)
    xyz, cls, sem = xyz[:1], cls[:1], sem[:1]
    offsets, emb, param = offsets[:1], emb[:1], param[:1]
    return xyz, cls, sem, offsets, emb, param


def _voxel_dicts_ref(out_coords, out_feats):
    d = {}
    oc = out_coords.detach().cpu().numpy()
    of = out_feats.detach().cpu().numpy()
    for r in range(oc.shape[0]):
        d[tuple(int(v) for v in oc[r])] = of[r]
    return d


def _voxel_dicts_ours(vx, n_props):
    d = {}
    feats = np.asarray(vx.feats)
    active = np.asarray(vx.active)
    for p in range(n_props):
        for v in np.nonzero(active[p])[0]:
            x, rem = divmod(int(v), G * G)
            y, z = divmod(rem, G)
            d[(p, x, y, z)] = feats[p, v]
    return d


def test_clusters_voxelization_matches_reference():
    ref = load_ref_model_full()
    xyz, cls, sem, offsets, emb, param = _scenario()
    n = cls.shape[1]
    pidx, poff = ref_proposals(ref, xyz, sem, offsets, emb, param, "train")
    n_ref = len(poff) - 1
    assert n_ref >= 4

    rng = np.random.RandomState(3)
    feats = rng.randn(n, 64).astype(np.float32)

    with torch.no_grad():
        vox_t, inp_map = ref.clusters_voxelization(
            torch.as_tensor(pidx), torch.as_tensor(poff),
            torch.as_tensor(feats), torch.as_tensor(xyz.reshape(-1, 3)),
            scale=G, spatial_shape=G, rand_quantize=False)

    props = ours_proposals(xyz + offsets * 0, cls, emb, param,
                           GroupingConfig(), 16, False)
    # grouping parity is already proven; reuse its pids
    vx = vox_ops.clusters_voxelization(
        jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(feats),
        jnp.asarray(props.point_pid), num_proposals=16, grid_size=G)

    want = _voxel_dicts_ref(vox_t.indices, vox_t.features)
    got = _voxel_dicts_ours(vx, n_ref)
    assert set(got) == set(want), (
        f"voxel sets differ: ours-only {list(set(got) - set(want))[:5]}, "
        f"ref-only {list(set(want) - set(got))[:5]}")
    for key in want:
        np.testing.assert_allclose(got[key], want[key], atol=1e-5, rtol=1e-5,
                                   err_msg=str(key))

    # per-point voxel assignment: reference inp_map row r -> voxel row of
    # proposals_idx row r; ours entry_voxel[0, pt]
    oc = vox_t.indices.detach().cpu().numpy()
    im = inp_map.detach().cpu().numpy()
    ev = np.asarray(vx.entry_voxel)
    for r in range(pidx.shape[0]):
        pt = int(pidx[r, 1])
        vref = oc[int(im[r])]
        v_ours = int(ev[0, pt])
        x, rem = divmod(v_ours, G * G)
        y, z = divmod(rem, G)
        assert (int(pidx[r, 0]), x, y, z) == tuple(
            int(v) for v in vref), f"row {r}"


def test_forward_instance_matches_reference():
    """The reference's tiny U-Net (real blocks.py via the spconv stub) +
    output layer + cls/iou/mask heads vs our masked-dense InstanceHead with
    importer-converted weights, on the SAME voxelized proposals."""
    ref = load_ref_model_full()
    xyz, cls, sem, offsets, emb, param = _scenario()
    n = cls.shape[1]
    pidx, poff = ref_proposals(ref, xyz, sem, offsets, emb, param, "train")
    n_ref = len(poff) - 1

    rng = np.random.RandomState(4)
    feats = rng.randn(n, 64).astype(np.float32)

    with torch.no_grad():
        vox_t, inp_map = ref.clusters_voxelization(
            torch.as_tensor(pidx), torch.as_tensor(poff),
            torch.as_tensor(feats), torch.as_tensor(xyz.reshape(-1, 3)),
            scale=G, spatial_shape=G, rand_quantize=False)
        inst_batch, cls_ref, iou_ref, mask_ref = ref.forward_instance(
            vox_t, inp_map)

    props = ours_proposals(xyz + offsets * 0, cls, emb, param,
                           GroupingConfig(), 16, False)
    vx = vox_ops.clusters_voxelization(
        jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(feats),
        jnp.asarray(props.point_pid), num_proposals=16, grid_size=G)

    head = InstanceHead(num_classes=7, channels=64, grid_size=G,
                        compute_bf16=False)
    variables = head.init(jax.random.PRNGKey(0), vx.feats, vx.active,
                          vx.entry_voxel, jnp.asarray(props.point_pid),
                          False)
    sd = {}
    for name, mod in (("tiny_unet", ref.tiny_unet),
                      ("tiny_unet_outputlayer", ref.tiny_unet_outputlayer),
                      ("mask_linear", ref.mask_linear),
                      ("cls_linear", ref.cls_linear),
                      ("iou_score_linear", ref.iou_score_linear)):
        for kk, v in mod.state_dict().items():
            sd[f"{name}.{kk}"] = v.numpy()
    params, batch_stats, report = convert_state_dict(
        sd, {"InstanceHead_0": variables["params"]},
        {"InstanceHead_0": variables.get("batch_stats", {})}, mode=5)
    assert not report.unmatched, report.unmatched

    out = head.apply(
        {"params": params["InstanceHead_0"],
         "batch_stats": batch_stats["InstanceHead_0"]},
        vx.feats, vx.active, vx.entry_voxel,
        jnp.asarray(props.point_pid), False)

    got_cls = np.asarray(out.cls_scores)[:n_ref]
    got_iou = np.asarray(out.iou_scores)[:n_ref]
    np.testing.assert_allclose(got_cls, cls_ref.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(got_iou, iou_ref.numpy(), atol=2e-3, rtol=2e-3)

    # instance_batch_idxs: proposal id per cluster-point row
    ib = inst_batch.detach().cpu().numpy()
    np.testing.assert_array_equal(ib, pidx[:, 0])

    # per-point mask scores: reference row (p, pt) vs our entry gather
    mr = mask_ref.detach().cpu().numpy()
    mo = np.asarray(out.mask_scores)          # [CH, N, cls]
    for r in range(pidx.shape[0]):
        np.testing.assert_allclose(mo[0, int(pidx[r, 1])], mr[r],
                                   atol=2e-3, rtol=2e-3,
                                   err_msg=f"mask row {r}")


def test_forward_instance_train_mode_batch_stats():
    """TRAIN-mode differential: torch BatchNorm1d computes batch statistics
    over the sparse voxel ROWS; MaskedBatchNorm must reproduce that by
    masking to active voxels (and the running-stat update conventions must
    correspond: torch momentum 0.1 == flax-style 0.9)."""
    ref = load_ref_model_full()
    ref.train()
    xyz, cls, sem, offsets, emb, param = _scenario()
    n = cls.shape[1]
    pidx, poff = ref_proposals(ref, xyz, sem, offsets, emb, param, "train")
    n_ref = len(poff) - 1
    rng = np.random.RandomState(6)
    feats = rng.randn(n, 64).astype(np.float32)
    with torch.no_grad():
        vox_t, inp_map = ref.clusters_voxelization(
            torch.as_tensor(pidx), torch.as_tensor(poff),
            torch.as_tensor(feats), torch.as_tensor(xyz.reshape(-1, 3)),
            scale=G, spatial_shape=G, rand_quantize=False)
        _, cls_ref, iou_ref, mask_ref = ref.forward_instance(vox_t, inp_map)

    props = ours_proposals(xyz + offsets * 0, cls, emb, param,
                           GroupingConfig(), 16, False)
    vx = vox_ops.clusters_voxelization(
        jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(feats),
        jnp.asarray(props.point_pid), num_proposals=16, grid_size=G)
    head = InstanceHead(num_classes=7, channels=64, grid_size=G,
                        compute_bf16=False)
    variables = head.init(jax.random.PRNGKey(0), vx.feats, vx.active,
                          vx.entry_voxel, jnp.asarray(props.point_pid),
                          True)
    sd = {}
    for name, mod in (("tiny_unet", ref.tiny_unet),
                      ("tiny_unet_outputlayer", ref.tiny_unet_outputlayer),
                      ("mask_linear", ref.mask_linear),
                      ("cls_linear", ref.cls_linear),
                      ("iou_score_linear", ref.iou_score_linear)):
        for kk, v in mod.state_dict().items():
            sd[f"{name}.{kk}"] = v.numpy()
    params, batch_stats, report = convert_state_dict(
        sd, {"InstanceHead_0": variables["params"]},
        {"InstanceHead_0": variables.get("batch_stats", {})}, mode=5)
    assert not report.unmatched
    out, _ = head.apply(
        {"params": params["InstanceHead_0"],
         "batch_stats": batch_stats["InstanceHead_0"]},
        vx.feats, vx.active, vx.entry_voxel,
        jnp.asarray(props.point_pid), True, mutable=["batch_stats"])
    # empty proposal slots contribute zero-active grids on our side only;
    # an all-empty proposal has NO voxel rows on the torch side, so the
    # batch statistics domains coincide exactly (active voxels == rows)
    np.testing.assert_allclose(np.asarray(out.cls_scores)[:n_ref],
                               cls_ref.numpy(), atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(out.iou_scores)[:n_ref],
                               iou_ref.numpy(), atol=5e-3, rtol=5e-3)
    mr = mask_ref.detach().cpu().numpy()
    mo = np.asarray(out.mask_scores)
    for r in range(0, pidx.shape[0], 7):
        np.testing.assert_allclose(mo[0, int(pidx[r, 1])], mr[r],
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"mask row {r}")


def test_full_posttrunk_chain_same_instances():
    """CAPSTONE: the complete post-trunk chain — set-aggregated grouping ->
    clusters_voxelization -> tiny U-Net + heads -> get_instances (with the
    reference's own rle codec) — produces the SAME instance list (ids,
    confidences, masks, list order) through the real checkpoint importer.

    The cls head's bias is boosted for one class so instances clear the
    hard-coded 0.45 softmax threshold (dgcnn-4.py:1050) with random weights.
    """
    ref = load_ref_model_full(using_set_aggr=True, with_rle=True)
    with torch.no_grad():
        ref.cls_linear.bias[3] += 6.0
    xyz, cls, sem, offsets, emb, param = _scenario()
    n = cls.shape[1]
    pidx, poff = ref_proposals(ref, xyz, sem, offsets, emb, param, "test")
    n_ref = len(poff) - 1
    rng = np.random.RandomState(5)
    feats = rng.randn(n, 64).astype(np.float32)

    with torch.no_grad():
        vox_t, inp_map = ref.clusters_voxelization(
            torch.as_tensor(pidx), torch.as_tensor(poff),
            torch.as_tensor(feats), torch.as_tensor(xyz.reshape(-1, 3)),
            scale=G, spatial_shape=G, rand_quantize=False)
        _, cls_ref, iou_ref, mask_ref = ref.forward_instance(vox_t, inp_map)
        ref_insts = ref.get_instances(
            torch.as_tensor(pidx), torch.as_tensor(sem.reshape(-1, 7)),
            cls_ref, iou_ref, mask_ref, v2p_map=None, lvl_fusion=False,
            instance_classes=7)
    assert len(ref_insts) >= 2, "capstone scenario produced no instances"

    props = ours_proposals(xyz + offsets * 0, cls, emb, param,
                           GroupingConfig(), 16, set_aggr=True)
    vx = vox_ops.clusters_voxelization(
        jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(feats),
        jnp.asarray(props.point_pid), num_proposals=16, grid_size=G)
    head = InstanceHead(num_classes=7, channels=64, grid_size=G,
                        compute_bf16=False)
    variables = head.init(jax.random.PRNGKey(0), vx.feats, vx.active,
                          vx.entry_voxel, jnp.asarray(props.point_pid),
                          False)
    sd = {}
    for name, mod in (("tiny_unet", ref.tiny_unet),
                      ("tiny_unet_outputlayer", ref.tiny_unet_outputlayer),
                      ("mask_linear", ref.mask_linear),
                      ("cls_linear", ref.cls_linear),
                      ("iou_score_linear", ref.iou_score_linear)):
        for kk, v in mod.state_dict().items():
            sd[f"{name}.{kk}"] = v.numpy()
    params, batch_stats, report = convert_state_dict(
        sd, {"InstanceHead_0": variables["params"]},
        {"InstanceHead_0": variables.get("batch_stats", {})}, mode=5)
    assert not report.unmatched
    out = head.apply(
        {"params": params["InstanceHead_0"],
         "batch_stats": batch_stats["InstanceHead_0"]},
        vx.feats, vx.active, vx.entry_voxel,
        jnp.asarray(props.point_pid), False)

    from gcanet_tpu.train import instances as inst_lib

    our_insts = inst_lib.get_instances(
        np.asarray(props.point_pid), sem.reshape(-1, 7),
        np.asarray(out.cls_scores)[:n_ref],
        np.asarray(out.iou_scores)[:n_ref],
        np.asarray(out.mask_scores),
        np.asarray(props.valid)[:n_ref], instance_classes=7)

    assert len(our_insts) == len(ref_insts)
    rle_decode = ref.forward_grouping.__func__.__globals__["rle_decode"]
    for k, (a, b) in enumerate(zip(our_insts, ref_insts)):
        assert int(a["label_id"]) == int(b["label_id"]), k
        np.testing.assert_allclose(a["conf"], float(b["conf"]),
                                   atol=2e-3, rtol=2e-3)
        ours_mask = inst_lib.rle_decode(a["pred_mask"])
        ref_mask = rle_decode(b["pred_mask"])
        np.testing.assert_array_equal(ours_mask, ref_mask,
                                      err_msg=f"instance {k} mask")
