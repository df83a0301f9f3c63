"""Back-projection rays and 3D line distances.

Reproduces `back_project_ray` (`src/utils/matching.py:10-17`) and
`line2point_distance_3D` / `line2line_distance_3D`
(`src/utils/calculate.py:20-32`) as pure jnp, points in (x, y).
"""
from __future__ import annotations

import jax.numpy as jnp


def back_project_rays(rk_inv, points_xy):
    """Unit world-space ray directions through pixels.

    Args:
      rk_inv: (..., 3, 3) R^-1 K^-1 matrix.
      points_xy: (..., N, 2) pixel coordinates (x, y).

    Returns:
      (..., N, 3) unit direction vectors from the camera center.
    """
    ones = jnp.ones(points_xy.shape[:-1] + (1,), points_xy.dtype)
    hom = jnp.concatenate([points_xy[..., :2], ones], axis=-1)
    d = jnp.einsum("...ij,...nj->...ni", rk_inv, hom, precision="highest")
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    norm = jnp.where(norm == 0.0, 1.0, norm)
    return d / norm


def line_point_distance_3d(origin, directions, points3d):
    """Distance from 3D points to lines (origin + t * direction).

    Matches `line2point_distance_3D` (`src/utils/calculate.py:26-32`):
    |(x2-x1) x (x1-x0)| / |x2-x1| with x1=origin, x2=origin+direction.
    """
    x1 = origin
    d = directions
    cross = jnp.cross(d, x1 - points3d)
    dn = jnp.linalg.norm(d, axis=-1)
    dn = jnp.where(dn == 0.0, 1.0, dn)
    return jnp.linalg.norm(cross, axis=-1) / dn


def line_line_distance_3d(p1, d1, p2, d2):
    """Distance between two 3D lines (`src/utils/calculate.py:20-24`)."""
    n = jnp.cross(d1, d2)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    norm = jnp.where(norm == 0.0, 1.0, norm)
    n = n / norm
    return jnp.abs(jnp.sum(n * (p1 - p2), axis=-1))
