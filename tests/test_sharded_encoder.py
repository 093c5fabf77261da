"""Point-axis-sharded trunk (parallel/sharded_encoder.py) vs the unsharded
model: same params, same cloud, identical per-point outputs.

This is ring-kNN's production consumer (VERDICT r3 item 8): clouds larger
than one chip's working set get per-point type/param/embedding by sharding
the point axis over the mesh.  The parity test pins the ring composition
(ring kNN under both metrics, ring neighbour gathers, pmax global pool)
against the single-device path bit-for-float.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig
from gcanet_tpu.models.primitive_net import PrimitiveNet
from gcanet_tpu.parallel.sharded_encoder import make_sharded_type_fn


def _cfg(n=256, k=12):
    return Config(num_points=n, batch_size=1, nn_nb=k, knn_impl="xla",
                  offset_knn=6, offset_keypoints=16, max_instances=8,
                  grouping=GroupingConfig(radius=0.1, min_npoint=5,
                                          cc_max_iters=8),
                  instance_head=InstanceHeadConfig(grid_size=8,
                                                   max_proposals=8))


def _mesh():
    if jax.device_count() != 8:
        pytest.skip("needs the 8-device virtual CPU mesh from conftest")
    return Mesh(np.array(jax.devices()), ("data",))


def test_sharded_trunk_matches_unsharded():
    cfg = _cfg()
    mesh = _mesh()
    model = PrimitiveNet(cfg)
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (1, cfg.num_points, 3))
    nrm = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_points, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    variables = model.init({"params": rng}, xyz, nrm, train=False,
                           rng=jax.random.PRNGKey(2))
    out = model.apply(variables, xyz, nrm, train=False,
                      rng=jax.random.PRNGKey(2))

    x6 = jnp.concatenate([xyz[0], nrm[0]], axis=-1)
    x6 = jax.device_put(x6, NamedSharding(mesh, P("data")))
    tpp, ppp, emb = make_sharded_type_fn(cfg, mesh)(variables["params"], x6)

    np.testing.assert_allclose(np.asarray(tpp),
                               np.asarray(out.type_per_point)[0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ppp),
                               np.asarray(out.param_per_point)[0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(emb),
                               np.asarray(out.embedding)[0],
                               atol=2e-4, rtol=2e-4)


def test_predictor_serves_oversized_cloud():
    """Serving e2e: a cloud 4x the compiled num_points goes through
    Predictor.predict_type_sharded on the 8-device mesh."""
    _mesh()
    from gcanet_tpu.serve import Predictor

    cfg = _cfg(n=128)
    pred = Predictor(cfg)
    rng = np.random.RandomState(0)
    big_n = 512
    xyz = rng.uniform(size=(big_n, 3)).astype(np.float32)
    nrm = rng.normal(size=(big_n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    res = pred.predict_type_sharded(xyz, nrm)
    assert res["type_per_point"].shape == (big_n, cfg.num_primitives)
    assert res["param_per_point"].shape == (big_n, 22)
    assert res["embedding"].shape == (big_n, cfg.out_dim)
    assert res["types"].shape == (big_n,)
    assert np.isfinite(res["type_per_point"]).all()
