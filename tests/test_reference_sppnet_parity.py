"""Model-level differential: SPPNet (HPNet-style baseline) vs the reference.

The reference's models/sppnet.py is pure torch (its only CUDA touch is a
hardcoded gather device) — exec-load it at test time, convert its
randomly-initialised state_dict through the REAL checkpoint-importer
``model="sppnet"`` key map, and assert our flax ``PrimitiveNetSPP`` produces
the same embedding/type/normal/param tensors, including the reference's
in-forward seeded subsample permutation (sppnet.py:283-297).  This proves
both the sppnet transcription and that reference-trained sppnet checkpoints
evaluate equivalently here.  Skips where the snapshot is absent.
"""

import pathlib
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcanet_tpu.config import Config
from gcanet_tpu.models.sppnet import PrimitiveNetSPP
from gcanet_tpu.utils.import_torch import convert_state_dict

REF = pathlib.Path("/root/reference/models/sppnet.py")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference snapshot not available")


def _load_ref():
    src = REF.read_text()
    # the graph-feature helpers hardcode the gather device (sppnet.py:85)
    src = src.replace("torch.device('cuda')", "torch.device('cpu')")
    ns = {"__file__": str(REF)}
    exec(compile(src, str(REF), "exec"), ns)
    return ns


def test_sppnet_forward_matches_reference():
    import torch

    k, b, n = 12, 2, 96
    ns = _load_ref()
    opt = types.SimpleNamespace(loss_class="frpn")
    torch.manual_seed(3)
    # constructor args as PrimitiveNet passes them (sppnet.py:360-366)
    ref = ns["PrimitivesEmbeddingDGCNGn"](
        opt=opt, emb_size=64, num_primitives=10, mode=5, num_channels=6,
        nn_nb=k)
    ref.eval()

    rng = np.random.RandomState(11)
    xyz = rng.randn(b, n, 3).astype(np.float32)
    nrm = rng.randn(b, n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    with torch.no_grad():
        emb, tpp, npp, ppp, subidx = ref(torch.as_tensor(xyz),
                                         torch.as_tensor(nrm),
                                         postprocess=True)

    # replicate the reference's seeded in-forward shuffle (sppnet.py:283-288):
    # with N < 7000 the whole cloud is permuted, deterministically at
    # postprocess time
    np.random.seed(1234)
    perm = np.arange(n)
    np.random.shuffle(perm)
    perm = perm[:7000]
    assert np.array_equal(subidx.numpy()[0], perm)

    xyz_p = xyz[:, perm]
    nrm_p = nrm[:, perm]

    cfg = Config(num_points=n, batch_size=b, nn_nb=k, out_dim=64,
                 loss_class="frpn", knn_impl="xla")
    ours = PrimitiveNetSPP(cfg, num_primitives=10, emb_size=64)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(xyz_p),
                         jnp.asarray(nrm_p), train=False)["params"]
    sd = {kk: v.numpy() for kk, v in ref.state_dict().items()}
    params, _, report = convert_state_dict(sd, template, {}, mode=5,
                                           model="sppnet")
    assert not report.unmatched, report.unmatched
    assert not report.missing, report.missing

    out = ours.apply({"params": params}, jnp.asarray(xyz_p),
                     jnp.asarray(nrm_p), train=False)

    np.testing.assert_allclose(np.asarray(out.embedding), emb.numpy(),
                               atol=1e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out.type_per_point), tpp.numpy(),
                               atol=1e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out.normal_per_point), npp.numpy(),
                               atol=1e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out.param_per_point), ppp.numpy(),
                               atol=1e-3, rtol=2e-3)
