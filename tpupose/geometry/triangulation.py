"""Time-weighted DLT triangulation with per-joint view masks.

This is the TPU-native equivalent of the reference's production kernel
`SVD_pose_kernel_jf` (`src/utils/construction.py:89-114`):

  * each (view v, joint j) contributes two normalized DLT rows
        r0 = (x * P_v[2] - P_v[0]) / ||.||,  r1 = (y * P_v[2] - P_v[1]) / ||.||
    weighted by exp(-lambda_t * T_v) (T_v = frames since that view's 2D pose),
  * per joint, the 3D point is the null vector of the stacked kept rows,
  * joints with fewer than 2 kept views fall back to the motion-predicted pose.

Instead of a ragged per-joint SVD, we zero out masked rows and take the
smallest eigenvector of the 4x4 normal matrix A^T A per joint — zero rows do
not change A^T A, so this is exactly the reference's SVD null vector (up to
sign, which the dehomogenization removes), and batched 4x4 eigh maps far
better onto TPU than many small ragged SVDs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: Relative floor on the per-view time weights inside `triangulate_joints`
#: (documented deviation from the raw reference weighting). The reference
#: weights each view's DLT rows by exp(-lambda_t * T_v) with lambda_t = 5,
#: i.e. a view 2 frames stale enters at 4.5e-5 of the fresh view — and at
#: (4.5e-5)^2 ~ 2e-9 of it in the NORMAL matrix this kernel solves. That is
#: below f32 rounding of the O(1) fresh-view entries, so whenever the stale
#: view is the only depth anchor (2 kept views, one stale — a routine
#: occlusion pattern), the f32 normal matrix is numerically rank-2 with a
#: 2-D null space and the solve returns an arbitrary point on the fresh
#: view's ray (measured: 9.2 m off on a 1-px-noise scene where f64 SVD gets
#: 6 mm; the f64 oracle tracker mints ~half the jit's track ids on
#: 1,000-frame soaks purely from this). Flooring each view's weight at
#: 1e-2 x (max kept weight per joint) keeps every kept view >= 1e-4 of the
#: fresh view in the normal matrix — 3 orders above f32 noise — while
#: shifting the mathematical optimum by only O(floor^2): measured 1.7e-7 m
#: against the unfloored f64 solution. The oracle applies the same floor
#: (`tracking/oracle.py::triangulate`) so spec and jit stay in lockstep.
TIME_WEIGHT_REL_FLOOR = 1e-2


def dlt_design_rows(P, poses_xy, weights):
    """Per-view, per-joint normalized + weighted DLT row pairs.

    Args:
      P: (V, 3, 4) projection matrices.
      poses_xy: (V, J, 2) 2D joints (x, y).
      weights: (V,) scalar weight per view (e.g. exp(-lambda_t * T_v)).

    Returns:
      (V, J, 2, 4) rows.
    """
    x = poses_xy[..., 0]  # (V, J)
    y = poses_xy[..., 1]
    r0 = x[..., None] * P[:, None, 2, :] - P[:, None, 0, :]  # (V, J, 4)
    r1 = y[..., None] * P[:, None, 2, :] - P[:, None, 1, :]
    rows = jnp.stack([r0, r1], axis=2)  # (V, J, 2, 4)
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    norm = jnp.where(norm == 0.0, 1.0, norm)
    rows = rows / norm * weights[:, None, None, None]
    return rows


def adj4x4(m):
    """Closed-form adjugate (and determinant) for batched (..., 4, 4).

    adj(M) = det(M) * M^-1 without the division: for a DLT normal matrix
    with one near-zero eigenvalue, adj(M) ~= (l2*l3*l4) * v1 v1^T is RANK-1
    dominated by exactly the null direction we want, and — unlike the
    inverse — involves no division by a catastrophically-cancelling f32
    determinant. Pure elementwise arithmetic, VPU-vectorized across the
    whole (tracks x joints) batch (vs ~1 ms/frame of `eigh` custom calls,
    docs/PERF.md).

    Returns (adj, det).
    """
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]; d = m[..., 0, 3]
    e = m[..., 1, 0]; f = m[..., 1, 1]; g = m[..., 1, 2]; h = m[..., 1, 3]
    i = m[..., 2, 0]; j = m[..., 2, 1]; k = m[..., 2, 2]; l = m[..., 2, 3]
    mm = m[..., 3, 0]; n = m[..., 3, 1]; o = m[..., 3, 2]; p = m[..., 3, 3]

    kp_lo = k * p - l * o
    jp_ln = j * p - l * n
    jo_kn = j * o - k * n
    ip_lm = i * p - l * mm
    io_km = i * o - k * mm
    in_jm = i * n - j * mm

    c00 = f * kp_lo - g * jp_ln + h * jo_kn
    c01 = -(e * kp_lo - g * ip_lm + h * io_km)
    c02 = e * jp_ln - f * ip_lm + h * in_jm
    c03 = -(e * jo_kn - f * io_km + g * in_jm)

    det = a * c00 + b * c01 + c * c02 + d * c03

    c10 = -(b * kp_lo - c * jp_ln + d * jo_kn)
    c11 = a * kp_lo - c * ip_lm + d * io_km
    c12 = -(a * jp_ln - b * ip_lm + d * in_jm)
    c13 = a * jo_kn - b * io_km + c * in_jm

    gp_ho = g * p - h * o
    fp_hn = f * p - h * n
    fo_gn = f * o - g * n
    ep_hm = e * p - h * mm
    eo_gm = e * o - g * mm
    en_fm = e * n - f * mm

    c20 = b * gp_ho - c * fp_hn + d * fo_gn
    c21 = -(a * gp_ho - c * ep_hm + d * eo_gm)
    c22 = a * fp_hn - b * ep_hm + d * en_fm
    c23 = -(a * fo_gn - b * eo_gm + c * en_fm)

    gl_hk = g * l - h * k
    fl_hj = f * l - h * j
    fk_gj = f * k - g * j
    el_hi = e * l - h * i
    ek_gi = e * k - g * i
    ej_fi = e * j - f * i

    c30 = -(b * gl_hk - c * fl_hj + d * fk_gj)
    c31 = a * gl_hk - c * el_hi + d * ek_gi
    c32 = -(a * fl_hj - b * el_hi + d * ej_fi)
    c33 = a * fk_gj - b * ek_gi + c * ej_fi

    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20, c30], axis=-1),
            jnp.stack([c01, c11, c21, c31], axis=-1),
            jnp.stack([c02, c12, c22, c32], axis=-1),
            jnp.stack([c03, c13, c23, c33], axis=-1),
        ],
        axis=-2,
    )
    return adj, det


def inv4x4(m):
    """Closed-form cofactor inverse for batched (..., 4, 4) matrices."""
    adj, det = adj4x4(m)
    det = jnp.where(det == 0.0, 1e-30, det)
    return adj / det[..., None, None]


def _smallest_eigvec_4x4(M, iters: int = 3):
    """Eigenvector of the smallest eigenvalue for batched symmetric PSD
    (..., 4, 4) via adjugate-matvec inverse iteration.

    Each step multiplies by adj(M') ~ det * M'^-1 — same direction as
    inverse iteration (normalization absorbs the determinant, sign is
    irrelevant after dehomogenization) with none of the f32 cancellation a
    near-singular determinant division suffers. DLT normal matrices have
    lambda_min << lambda_2 by construction, so convergence is essentially
    one step; extra steps cover degenerate geometry. The matrix is
    pre-scaled to unit trace (direction-invariant) to keep cofactor
    magnitudes in f32 range, and regularized by eps*trace so exactly
    singular/all-masked systems stay finite.
    """
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2] + M[..., 3, 3]
    scale = jnp.where(tr > 0, tr, 1.0)[..., None, None]
    Mn = M / scale + 1e-7 * jnp.eye(4, dtype=M.dtype)
    adj, _ = adj4x4(Mn)
    # Start from the adjugate's largest column — already inside its dominant
    # eigenspace, so a near-orthogonal start cannot stall the iteration.
    col_norm2 = jnp.sum(adj * adj, axis=-2)
    v = jnp.take_along_axis(
        adj, jnp.argmax(col_norm2, axis=-1)[..., None, None], axis=-1
    )[..., 0]
    v = v + jnp.where(
        jnp.linalg.norm(v, axis=-1, keepdims=True) < 1e-30, 1.0, 0.0
    )  # all-zero adj (fully masked joint): any vector; fallback replaces it
    for _ in range(iters):
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-30)
        v = jnp.einsum("...ij,...j->...i", adj, v)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-30)


def triangulate_joints(P, poses_xy, view_weights, keep_mask, fallback=None,
                       min_views: int = 2):
    """Triangulate J joints from V views with per-joint view masks.

    Args:
      P: (V, 3, 4) projection matrices.
      poses_xy: (V, J, 2) 2D joints (x, y).
      view_weights: (V,) time weights exp(-lambda_t * T_v).
      keep_mask: (V, J) bool — view v participates in joint j.
      fallback: optional (J, 3) pose used for joints with < min_views kept
                views (the reference's motion-predicted `next_pose`,
                `src/utils/construction.py:106-107`).
      min_views: minimum kept views for triangulation (reference: 2).

    Returns:
      pose3d: (J, 3)
      n_views: (J,) int32 number of kept views per joint.
    """
    rows = dlt_design_rows(
        P, poses_xy[..., :2], jnp.ones_like(view_weights)
    )  # (V, J, 2, 4) normalized, unweighted
    # Per-joint relative weight floor (see TIME_WEIGHT_REL_FLOOR): without
    # it, stale-view rows vanish below f32 rounding in the normal matrix.
    w = view_weights[:, None] * keep_mask  # (V, J)
    wmax = jnp.max(w, axis=0, keepdims=True)
    w = jnp.maximum(w, wmax * TIME_WEIGHT_REL_FLOOR) * keep_mask
    rows = rows * w[:, :, None, None]
    # Normal matrix per joint: sum over views and the 2 rows.
    M = jnp.einsum("vjra,vjrb->jab", rows, rows, precision="highest")  # (J, 4, 4)
    X = _smallest_eigvec_4x4(M)  # (J, 4)
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    pts = X[..., :3] / w
    n_views = jnp.sum(keep_mask, axis=0).astype(jnp.int32)
    if fallback is not None:
        pts = jnp.where((n_views >= min_views)[:, None], pts, fallback)
    return pts, n_views


def triangulate_pairwise(P_a, P_b, pts_a, pts_b):
    """Two-view homogeneous DLT (cv2.triangulatePoints semantics).

    The reference's alternative build path `top_down_pose_kernel`
    (`src/utils/construction.py:9-31`) and `Person2d.triangulate`
    (`src/tracking/hypothesis.py:112-151`) use OpenCV's two-view DLT; this is
    the same unnormalized 4-row system solved by the null vector.

    Args:
      P_a, P_b: (3, 4) projection matrices.
      pts_a, pts_b: (J, 2) points (x, y).

    Returns:
      (J, 3) triangulated points.
    """
    def rows_for(P, pts):
        r0 = pts[:, 0:1] * P[2][None, :] - P[0][None, :]
        r1 = pts[:, 1:2] * P[2][None, :] - P[1][None, :]
        return jnp.stack([r0, r1], axis=1)  # (J, 2, 4)

    A = jnp.concatenate([rows_for(P_a, pts_a), rows_for(P_b, pts_b)], axis=1)
    M = jnp.einsum("jra,jrb->jab", A, A, precision="highest")
    X = _smallest_eigvec_4x4(M)
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X[..., :3] / w


def triangulate_top_down(P, poses_xy, weights2d, view_valid=None):
    """All-pairs two-view DLT, keep the pair with the least total
    reprojection error (the reference's alternative BUILD_3D kernel
    `top_down_pose_kernel`, `src/utils/construction.py:9-31`).

    Args:
      P: (V, 3, 4) projection matrices.
      poses_xy: (V, J, 2) per-view 2D joints (x, y).
      weights2d: (V, J) per-view per-joint weights/scores.
      view_valid: optional (V,) bool; invalid views are excluded from both
        pair candidates and the reprojection-error sum.

    Returns:
      pose3d: (J, 3) from the winning pair.
      weight3d: (J,) = mean of the winning pair's per-joint weights.
    """
    V = P.shape[0]
    if view_valid is None:
        view_valid = jnp.ones(V, bool)
    ii, jj = jnp.triu_indices(V, k=1)  # static pair list

    def one_pair(a, b):
        pose = triangulate_pairwise(P[a], P[b], poses_xy[a], poses_xy[b])
        hom = jnp.concatenate([pose, jnp.ones_like(pose[..., :1])], axis=-1)
        proj = jnp.einsum("vik,jk->vji", P, hom, precision="highest")
        # The reference guards the divide with z + 1e-5 (`construction.py:25`).
        xy = proj[..., :2] / (proj[..., 2:3] + 1e-5)
        per_view = jnp.sqrt(
            jnp.sum((xy - poses_xy) ** 2, axis=(1, 2))
        )  # Frobenius ||proj - obs|| per view (`construction.py:26`)
        err = jnp.sum(jnp.where(view_valid, per_view, 0.0))
        return pose, err, (weights2d[a] + weights2d[b]) / 2.0

    poses, errs, weights = jax.vmap(one_pair)(ii, jj)
    pair_ok = view_valid[ii] & view_valid[jj]
    errs = jnp.where(pair_ok, errs, jnp.inf)
    best = jnp.argmin(errs)
    return poses[best], weights[best]


def fuse_pairwise_humans(points, point_valid, weights, costs, person_valid=None):
    """Cost-weighted fusion of per-pair triangulations into one 3D person
    (the reference's `get_single_human3d`, `src/tracking/hypothesis.py:153-180`).

    Each candidate person (one per camera pair) contributes its joints with
    weight (total_cost - cost_p) / (total_cost * (count - 1)) — cheaper pairs
    count more; a single candidate passes through unweighted.

    Args:
      points: (N, J, 3) candidate joint positions.
      point_valid: (N, J) bool — joint j triangulated by candidate n.
      weights: (N, J) per-joint confidence of each candidate.
      costs: (N,) matching cost of each candidate pair.
      person_valid: optional (N,) bool candidate mask.

    Returns:
      human3d: (J, 3) fused joints (zeros where no candidate had the joint).
      weight3d: (J,) mean contributing confidence (0 where none).
      joint_valid: (J,) bool.
    """
    N = points.shape[0]
    if person_valid is None:
        person_valid = jnp.ones(N, bool)
    count = jnp.sum(person_valid)
    total_cost = jnp.sum(jnp.where(person_valid, costs, 0.0))
    multi = (total_cost - costs) / jnp.maximum(
        total_cost * jnp.maximum(count - 1, 1), 1e-12
    )
    w_person = jnp.where(count == 1, 1.0, multi)  # (N,)
    contrib = point_valid & person_valid[:, None]  # (N, J)
    human3d = jnp.sum(
        jnp.where(contrib[..., None], points * w_person[:, None, None], 0.0),
        axis=0,
    )
    n_contrib = jnp.sum(contrib, axis=0)
    weight3d = jnp.sum(jnp.where(contrib, weights, 0.0), axis=0) / jnp.maximum(
        n_contrib, 1
    )
    return human3d, weight3d, n_contrib > 0
