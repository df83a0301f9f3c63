"""Epipolar distances, fully vectorized over (views, views, joints).

Reproduces the math of the reference's `epipolar_distance` /
`epipolar_affinity_parallel` (`src/utils/matching.py:50-151`) without the
Python pair loops and without the (y, x) flips — points here are (x, y).
"""
from __future__ import annotations

import jax.numpy as jnp


def _homogenize(points_xy):
    ones = jnp.ones(points_xy.shape[:-1] + (1,), points_xy.dtype)
    return jnp.concatenate([points_xy[..., :2], ones], axis=-1)


def point_line_distance_2d(points_xy, lines):
    """Distance from 2D points to 2D lines (a, b, c) with ax + by + c = 0.

    Guards zero-norm lines by treating the norm as 1, matching the reference's
    `nu[nu == 0] = 1` / `norm[norm == 0] = 1` (`src/utils/matching.py:141-145`).
    """
    pts = _homogenize(points_xy)
    norm = jnp.sqrt(jnp.sum(lines[..., :2] ** 2, axis=-1))
    norm = jnp.where(norm == 0.0, 1.0, norm)
    return jnp.abs(jnp.sum(pts * lines, axis=-1)) / norm


def epipolar_distance_directed(F_ab, points_a, points_b):
    """Per-joint distances of points_b to the epilines of points_a.

    Args:
      F_ab: (3, 3) fundamental matrix with x_a^T F_ab x_b = 0.
      points_a: (J, 2+) points in view a, (x, y[, score]).
      points_b: (J, 2+) points in view b.

    Returns:
      (J,) distances of each b point to the epiline F_ab^T x_a.
    """
    lines_in_b = _homogenize(points_a[..., :2]) @ F_ab  # == (F_ab^T x_a)^T
    return point_line_distance_2d(points_b[..., :2], lines_in_b)


def epipolar_distance_pair(F_ab, points_a, points_b):
    """Symmetric pair of per-joint epipolar distances (d_a, d_b).

    d_a = distance of a's points to epilines of b's points (line = F_ab x_b),
    d_b = distance of b's points to epilines of a's points (line = F_ab^T x_a).
    This matches the reference's `epipolar_distance` columns (d1, d2)
    (`src/utils/matching.py:82-84`). The numerators x_a^T F x_b agree; only
    the line normalizations differ.
    """
    lines_in_a = _homogenize(points_b[..., :2]) @ F_ab.T  # (F_ab x_b)^T
    d_a = point_line_distance_2d(points_a[..., :2], lines_in_a)
    d_b = epipolar_distance_directed(F_ab, points_a, points_b)
    return d_a, d_b


def epipolar_distance_matrix(F_pairs, poses, valid=None):
    """Symmetrized per-joint epipolar distance tensor over all view pairs.

    Args:
      F_pairs: (V, V, 3, 3) fundamental matrices for each ordered view pair
               (F_pairs[a, b] with x_a^T F x_b = 0). For a multi-camera rig
               with one pose per camera this is simply CameraSet.F; for mixed
               assignments gather F[cam_of[a], cam_of[b]] first.
      poses:   (V, J, 2+) 2D poses, (x, y[, score]).
      valid:   optional (V,) mask; distances touching invalid views are 0.

    Returns:
      dist: (V, V, J) with dist[a, b, j] =
            0.5 * (d(x_a_j, F[a,b] x_b_j line) + d(x_b_j, F[a,b]^T x_a_j line))
      mean: (V, V) mean over joints (the reference's affinity_matrix before
            thresholding, `src/utils/matching.py:149`).

    Equivalent to `epipolar_affinity_parallel` (`src/utils/matching.py:115-151`)
    including its guard that same-camera pairs (F == 0) produce distance 0.
    """
    pts = _homogenize(poses[..., :2])  # (V, J, 3)
    # lines[a, b, j] = epiline in view b of point j from view a = F[a,b]^T x_a,
    # i.e. l_i = sum_k F[a, b][k, i] * x_a[k].
    lines = jnp.einsum("abki,ajk->abji", F_pairs, pts, precision="highest")  # (V, V, J, 3)
    d_directed = point_line_distance_2d(
        poses[None, :, :, :2], lines
    )  # (V, V, J): distance of view-b points to epilines from view-a points
    dist = 0.5 * (d_directed + jnp.swapaxes(d_directed, 0, 1))
    if valid is not None:
        pair_ok = valid[:, None] & valid[None, :]
        dist = jnp.where(pair_ok[:, :, None], dist, 0.0)
    mean = jnp.mean(dist, axis=-1)
    return dist, mean
