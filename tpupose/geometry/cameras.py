"""Camera model as a struct-of-arrays pytree.

Reference behavior being reproduced (see /root/reference):
  - per-camera projection matrices P (3x4), intrinsics K, extrinsics RT
    (`src/ivclabpose.py:35-46`)
  - precomputed RK_INV = R^-1 K^-1 and camera centers from RT
    (`src/ivclabpose.py:41-46`)
  - pairwise fundamental matrices built from (K, RT) pairs
    (`src/ivclabpose.py:162-181`), with a +1e-12 nudge for all-zero results

Unlike the reference (which stores 2D points as (row=y, col=x) and flips at
every geometry call site), this framework uses (x, y) everywhere.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Geometry must run at full f32 accuracy; JAX's default matmul precision
# (bf16 inputs on TPU, and the same semantics emulated on CPU) loses ~1e-3
# relative accuracy, which is pixels at f=800.
_mm = functools.partial(jnp.matmul, precision="highest")


class CameraSet(NamedTuple):
    """Calibrated multi-camera rig as a pytree of stacked arrays.

    Attributes:
      P:      (C, 3, 4) projection matrices (K @ RT).
      K:      (C, 3, 3) intrinsics.
      RT:     (C, 3, 4) extrinsics [R | t] mapping world -> camera.
      F:      (C, C, 3, 3) fundamental matrices; F[a, b] relates points so that
              x_a^T F[a, b] x_b = 0 (the reference's cam_a.F[cam_b] layout).
      rk_inv: (C, 3, 3) R^-1 K^-1, pixel -> world-ray matrix.
      center: (C, 3) camera centers in world coordinates.
      size:   (C, 2) image (width, height) per camera.
    """

    P: jnp.ndarray
    K: jnp.ndarray
    RT: jnp.ndarray
    F: jnp.ndarray
    rk_inv: jnp.ndarray
    center: jnp.ndarray
    size: jnp.ndarray

    @property
    def num_cameras(self) -> int:
        return self.P.shape[0]

    # The reference Camera exposes undistortion hooks that are NO-OPS (its
    # datasets ship pre-undistorted images — `src/ivclabpose.py:48-60`).
    # Kept for API parity; a real distortion model would slot in here.
    def undistort(self, images):
        """(…, H, W, C) images -> unchanged (reference parity no-op)."""
        return images

    def undistort_points(self, points2d):
        """(…, 2+) pixel points -> unchanged (reference parity no-op)."""
        return points2d


def fundamental_from_krt(K0, R0, T0, K1, R1, T1):
    """Fundamental matrix between two calibrated views.

    Same construction as the reference's `fundamental_op`
    (`src/ivclabpose.py:166-168`):
        F = K0^-T (R0 R1^T) K1^T [K1 R1 R0^T (T0 - R0 R1^T T1)]_x
    """
    R_rel = _mm(R0, R1.T)
    t = _mm(K1, _mm(R1, _mm(R0.T, (T0 - _mm(R_rel, T1))[:, None])))[:, 0]
    skew = jnp.array(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ]
    )
    return _mm(_mm(_mm(jnp.linalg.inv(K0).T, R_rel), K1.T), skew)


def fundamental_matrices(K, RT):
    """All-pairs fundamental matrices, (C, C, 3, 3).

    Diagonal entries (a camera with itself) come out all-zero; the reference
    nudges those by +1e-12 to avoid downstream NaN (`src/ivclabpose.py:175-176`)
    and we do the same.
    """
    K = jnp.asarray(K, jnp.float32)
    RT = jnp.asarray(RT, jnp.float32)
    C = K.shape[0]
    rows = []
    for a in range(C):
        cols = []
        for b in range(C):
            F = fundamental_from_krt(
                K[a], RT[a, :, :3], RT[a, :, 3], K[b], RT[b, :, :3], RT[b, :, 3]
            )
            F = jnp.where(jnp.sum(jnp.abs(F)) == 0.0, F + 1e-12, F)
            cols.append(F)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def make_camera_set(P, K, RT, width: int, height: int) -> CameraSet:
    """Build a CameraSet from stacked calibration arrays.

    Args:
      P:  (C, 3, 4) projection matrices.
      K:  (C, 3, 3) intrinsics.
      RT: (C, 3, 4) extrinsics.
      width, height: image size shared by all cameras.
    """
    P = jnp.asarray(P, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    RT = jnp.asarray(RT, jnp.float32)
    C = P.shape[0]

    R = RT[:, :, :3]
    t = RT[:, :, 3]
    rk_inv = _mm(jnp.linalg.inv(R), jnp.linalg.inv(K))
    # center = -R^-1 t  (same as inverting the 4x4 [RT; 0 0 0 1]).
    center = -jnp.einsum("cij,cj->ci", jnp.linalg.inv(R), t, precision="highest")
    F = fundamental_matrices(K, RT)
    size = jnp.tile(jnp.array([[width, height]], jnp.float32), (C, 1))
    return CameraSet(P=P, K=K, RT=RT, F=F, rk_inv=rk_inv, center=center, size=size)


def project_points(P, points3d):
    """Project 3D points to 2D pixel coordinates (x, y).

    Args:
      P: (..., 3, 4) projection matrix (broadcastable).
      points3d: (..., N, 3) world points.

    Returns:
      (..., N, 2) pixel coordinates (x, y).

    The reference's scalar path guards c == 0 with 1e-5
    (`src/ivclabpose.py:75`); we apply the same guard vectorized. Note the
    reference returns (y, x) to match its storage convention; we return (x, y).
    """
    points3d = jnp.asarray(points3d)
    ones = jnp.ones(points3d.shape[:-1] + (1,), points3d.dtype)
    hom = jnp.concatenate([points3d, ones], axis=-1)
    # Geometry needs full f32 accuracy; TPU default matmul precision is lower.
    proj = jnp.einsum("...ij,...nj->...ni", P, hom, precision="highest")
    z = proj[..., 2:3]
    z = jnp.where(z == 0.0, 1e-5, z)
    return proj[..., :2] / z


def load_calibration_pickle(path: str, num_cameras: int | None = None):
    """Load the reference's `camera_parameter.pickle` format.

    The pickle holds a dict with keys 'P' (C,3,4), 'K' (C,3,3), 'RT' (C,3,4)
    (consumed at `src/ivclabpose.py:162-165`). Returns numpy arrays.
    """
    import pickle

    with open(path, "rb") as f:
        params = pickle.load(f)
    P = np.asarray(params["P"], np.float32)
    K = np.asarray(params["K"], np.float32)
    RT = np.asarray(params["RT"], np.float32)
    if num_cameras is not None:
        P, K, RT = P[:num_cameras], K[:num_cameras], RT[:num_cameras]
    return P, K, RT
