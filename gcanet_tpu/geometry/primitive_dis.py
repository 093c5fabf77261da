"""Closed-form point-to-primitive distances, differentiable and vectorised.

JAX port of the semantics of ``utils/primitive_dis.py`` (HPNet heritage):
  * ``distance_from_plane``    (:126-148)   points x M plane params -> [N, M]
  * ``distance_from_sphere``   (:150-167)
  * ``distance_from_cylinder`` (:169-212)
  * ``distance_from_cone``     (:217-258)
  * ``distance_from_torus``    (:95-124)    single torus -> [N]
  * ``distance_from_bspline``  (:260-269)   one-sided chamfer vs sampled points
All squared distances; ``sqrt=True`` applies the guarded sqrt (:15-17).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1.1920929e-07


def guard_sqrt(x, minimum=1e-5):
    return jnp.sqrt(jnp.clip(x, min=minimum))


def chamfer_distance_one_side(pred, gt, sqrt=False):
    """Min squared distance from each pred point to the gt set; mean over gt
    side matches primitive_dis.py:20-52 with one_side=True."""
    diff = jnp.sum((pred[None, :, :] - gt[:, None, :]) ** 2, -1)   # [M_gt, N_pred]
    if sqrt:
        diff = guard_sqrt(diff)
    return jnp.min(diff, axis=0)                                   # [N_pred]


def distance_from_plane(points, params, sqrt=False):
    """points [N, 3], params [M, 4] (unit normal ++ offset) -> [N, M]."""
    a = params[:, :3]
    d = params[:, 3]
    dist = (points @ a.T - d[None, :]) ** 2
    return guard_sqrt(dist) if sqrt else dist


def distance_from_sphere(points, params, sqrt=False):
    """points [N, 3], params [M, 4] (center ++ radius) -> [N, M]."""
    center = params[:, :3]
    radius = params[:, 3]
    d = jnp.sqrt(jnp.clip(jnp.sum(
        (points[:, None, :] - center[None, :, :]) ** 2, -1), min=1e-12))
    dist = (d - radius[None, :]) ** 2
    return guard_sqrt(dist) if sqrt else dist


def distance_from_cylinder(points, params, sqrt=False):
    """points [N, 3], params [M, 7] (axis ++ center ++ radius) -> [N, M]."""
    axis = params[:, :3]
    center = params[:, 3:6]
    radius = params[:, 6]
    v = points[:, None, :] - center[None, :, :]                    # [N, M, 3]
    prj = jnp.sum(v * axis[None, :, :], -1) ** 2
    d2 = jnp.clip(jnp.sum(v * v, -1) - prj, min=1e-5)              # :197 clamp
    dist = (jnp.sqrt(d2) - radius[None, :]) ** 2
    return guard_sqrt(dist) if sqrt else dist


def distance_from_cone(points, params, sqrt=False):
    """points [N, 3], params [M, 7] (apex ++ axis ++ theta) -> [N, M]."""
    apex = params[:, :3]
    axis = params[:, 3:6]
    theta = params[:, 6]
    v = points[:, None, :] - apex[None, :, :] + 1e-8
    mod_v = jnp.sqrt(jnp.clip(jnp.sum(v * v, -1), min=1e-12))
    alpha_x = jnp.sum(v * axis[None, :, :], -1) / (mod_v + 1e-7)
    alpha = jnp.arccos(jnp.clip(alpha_x, -0.999, 0.999))
    dist_angle = jnp.clip(jnp.abs(alpha - theta[None, :]), max=3.142 / 2.0)
    dist = (mod_v * jnp.sin(dist_angle)) ** 2
    return guard_sqrt(dist) if sqrt else dist


def distance_from_torus(points, params, sqrt=False):
    """points [N, 3]; params = (axis [3], center [3], major_r, minor_r) -> [N]."""
    axis, center, major_r, minor_r = params
    axis = axis / jnp.linalg.norm(axis)
    c2p = points - center[None, :]
    z = c2p @ axis
    x = guard_sqrt(jnp.sum(c2p ** 2, 1) - z ** 2)
    right = (guard_sqrt((x - major_r) ** 2 + z ** 2) - minor_r) ** 2
    left = (guard_sqrt((x + major_r) ** 2 + z ** 2) - minor_r) ** 2
    dist = jnp.minimum(right, left)
    return guard_sqrt(dist) if sqrt else dist


def distance_from_bspline(points, sampled_surface, sqrt=False):
    """One-sided chamfer to densely-sampled spline points (:260-269) -> [N]."""
    return chamfer_distance_one_side(points, sampled_surface, sqrt=sqrt)


ROUTINES = {
    5: distance_from_sphere,
    1: distance_from_plane,
    4: distance_from_cylinder,
    3: distance_from_cone,
}
