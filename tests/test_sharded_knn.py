"""Ring-sharded kNN vs single-device exact kNN on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcanet_tpu.ops import knn as K
from gcanet_tpu.parallel.sharded_knn import make_sharded_knn


def test_ring_knn_matches_exact():
    n_dev = min(len(jax.devices()), 8)
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(mesh_utils.create_device_mesh((n_dev,)), ("data",))
    n, c, k = 64 * n_dev, 8, 7
    rng = np.random.RandomState(0)
    x = rng.randn(n, c).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    idx = np.asarray(make_sharded_knn(mesh, k)(xs))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(K.knn_indices(jnp.asarray(x)[None], k, "xla"))[0]

    # compare as distance sets (ties can reorder indices)
    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    got = np.sort(np.take_along_axis(d, idx, axis=1), axis=1)
    want = np.sort(np.take_along_axis(d, ref, axis=1), axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4)
