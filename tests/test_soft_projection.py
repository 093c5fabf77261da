"""SoftProjection oracle test — the reference's own hand-computed expectations.

models/search_knn.py:177-304 ships a numerical expectation test (clouds and
expected soft-NN outputs computed by hand); we assert against the same values
instead of only printing MSEs as the reference does.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcanet_tpu.models.soft_projection import SoftProjection

POINT_CLOUD = np.array(
    [[0, 0, 0], [1, 0, 0], [2, 0, 0], [5, 5, 5], [7, 7, 8], [7, 7, 8.5]],
    np.float32)
QUERY_CLOUD = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1],
     [5, 4, 4], [4, 5, 4], [4, 4, 5],
     [8, 7, 7], [7, 8, 7], [7, 7, 8]], np.float32)
POINT_FEATURES = np.arange(1, 31, dtype=np.float32).reshape(6, 5)

# search_knn.py:252-266, k=3, sigma=1: soft-NN features at each query point
EXPECTED_FEATURES_NN_3 = np.array(
    [[6.0, 7.0, 8.0, 9.0, 10.0],
     [2.459, 3.459, 4.459, 5.459, 6.459],
     [2.459, 3.459, 4.459, 5.459, 6.459],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [22.113, 23.113, 24.113, 25.113, 26.113],
     [22.113, 23.113, 24.113, 25.113, 26.113],
     [23.189, 24.189, 25.189, 26.189, 27.189]], np.float32)

# search_knn.py:225-234: roles swapped (database=query cloud), sigma=0.1^2
EXPECTED_NN_CLOUD = np.array(
    [[0.333, 0.333, 0.333],
     [1, 0, 0],
     [1, 0, 0],
     [4.333, 4.333, 4.333],
     [7, 7, 8],
     [7, 7, 8]], np.float32)


def _apply(mod, method, *args):
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 3)),
                         jnp.zeros((1, 2, 3)))
    return np.asarray(mod.apply(variables, *args, method=method))


def test_propagate_matches_reference_expectations():
    mod = SoftProjection(group_size=3, initial_temperature=1.0)
    out = _apply(mod, SoftProjection.propagate,
                 jnp.asarray(POINT_CLOUD[None]),
                 jnp.asarray(POINT_FEATURES[None]),
                 jnp.asarray(QUERY_CLOUD[None]))
    np.testing.assert_allclose(out[0], EXPECTED_FEATURES_NN_3, atol=2e-3)


def test_project_matches_reference_expectations():
    mod = SoftProjection(group_size=3, initial_temperature=0.1)
    out = _apply(mod, SoftProjection.project,
                 jnp.asarray(QUERY_CLOUD[None]),
                 jnp.asarray(POINT_CLOUD[None]))
    np.testing.assert_allclose(out[0], EXPECTED_NN_CLOUD, atol=2e-3)


def test_project_and_propagate_and_action_dispatch():
    mod = SoftProjection(group_size=1, initial_temperature=1.0)
    pc = jnp.asarray(POINT_CLOUD[None])
    qc = jnp.asarray(QUERY_CLOUD[None])
    pf = jnp.asarray(POINT_FEATURES[None])
    variables = mod.init(jax.random.PRNGKey(0), pc, qc)
    proj, prop = mod.apply(variables, pc, qc, pf,
                           action="project_and_propagate")
    # k=1 soft weights are exactly 1 -> hard NN (search_knn.py:236-250)
    np.testing.assert_allclose(
        np.asarray(prop[0]),
        np.array([POINT_FEATURES[j] for j in [1, 0, 0, 3, 3, 3, 4, 4, 4]]),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(proj[0]),
        np.array([POINT_CLOUD[j] for j in [1, 0, 0, 3, 3, 3, 4, 4, 4]]),
        atol=1e-5)
