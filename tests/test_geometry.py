"""Geometry kernel tests with synthetic calibrated rigs.

Strategy per SURVEY.md §4: project random 3D skeletons through known cameras,
assert epipolar distances of corresponding points ~ 0 and that triangulation
recovers the 3D points.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.geometry import (
    back_project_rays,
    epipolar_distance_matrix,
    epipolar_distance_directed,
    line_point_distance_3d,
    make_camera_set,
    project_points,
    triangulate_joints,
    triangulate_pairwise,
)
from tests.helpers import make_rig, project_np, random_skeletons


@pytest.fixture(scope="module")
def rig():
    P, K, RT = make_rig(num_cameras=4)
    return make_camera_set(P, K, RT, 1280, 720)


def test_projection_matches_numpy(rig):
    rng = np.random.default_rng(0)
    pts = random_skeletons(rng, n_people=1)[0]
    ours = np.asarray(project_points(rig.P[1], pts))
    ref = project_np(np.asarray(rig.P[1]), pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_camera_center_reprojects_consistently(rig):
    # A point along the ray from camera center projects to the pixel the ray
    # was built from: verifies rk_inv + center are mutually consistent.
    pix = jnp.array([[640.0, 360.0], [100.0, 50.0]])
    rays = back_project_rays(rig.rk_inv[2], pix)
    pts3d = rig.center[2][None, :] + 3.0 * rays
    reproj = project_points(rig.P[2], pts3d)
    np.testing.assert_allclose(np.asarray(reproj), np.asarray(pix), atol=1e-2)


def test_epipolar_distance_zero_for_correspondences(rig):
    rng = np.random.default_rng(1)
    pts3d = random_skeletons(rng, n_people=1)[0]  # (J, 3)
    poses = np.stack([project_np(np.asarray(rig.P[c]), pts3d) for c in range(4)])
    dist, mean = epipolar_distance_matrix(rig.F, jnp.asarray(poses))
    dist = np.asarray(dist)
    off_diag = dist[~np.eye(4, dtype=bool)]
    assert np.abs(off_diag).max() < 0.1  # pixels
    assert np.allclose(np.diagonal(np.asarray(mean)), 0.0, atol=1e-3)


def test_epipolar_distance_nonzero_for_mismatch(rig):
    rng = np.random.default_rng(2)
    two = random_skeletons(rng, n_people=2)
    pose_a = project_np(np.asarray(rig.P[0]), two[0])
    pose_b = project_np(np.asarray(rig.P[1]), two[1])  # different person
    d = epipolar_distance_directed(rig.F[0, 1], jnp.asarray(pose_a), jnp.asarray(pose_b))
    assert np.asarray(d).mean() > 5.0


def test_epipolar_matrix_symmetry(rig):
    rng = np.random.default_rng(3)
    poses = rng.uniform(0, 700, size=(4, 17, 2)).astype(np.float32)
    dist, _ = epipolar_distance_matrix(rig.F, jnp.asarray(poses))
    dist = np.asarray(dist)
    np.testing.assert_allclose(dist, np.transpose(dist, (1, 0, 2)), atol=1e-3)


def test_triangulation_recovers_points(rig):
    rng = np.random.default_rng(4)
    pts3d = random_skeletons(rng, n_people=1)[0]
    poses = np.stack([project_np(np.asarray(rig.P[c]), pts3d) for c in range(4)])
    weights = jnp.ones(4)
    keep = jnp.ones((4, 17), bool)
    rec, n_views = triangulate_joints(rig.P, jnp.asarray(poses), weights, keep)
    np.testing.assert_allclose(np.asarray(rec), pts3d, atol=5e-3)
    assert np.all(np.asarray(n_views) == 4)


def test_triangulation_respects_mask_and_fallback(rig):
    rng = np.random.default_rng(5)
    pts3d = random_skeletons(rng, n_people=1)[0]
    poses = np.stack([project_np(np.asarray(rig.P[c]), pts3d) for c in range(4)])
    # Corrupt view 3 badly; mask it out for all joints -> still recovers.
    poses_bad = poses.copy()
    poses_bad[3] += 300.0
    keep = np.ones((4, 17), bool)
    keep[3] = False
    # Joint 0: only one view kept -> fallback should be used.
    keep[1:, 0] = False
    fallback = np.full((17, 3), 9.0, np.float32)
    rec, n_views = triangulate_joints(
        rig.P, jnp.asarray(poses_bad), jnp.ones(4), jnp.asarray(keep),
        fallback=jnp.asarray(fallback),
    )
    rec = np.asarray(rec)
    np.testing.assert_allclose(rec[1:], pts3d[1:], atol=1e-2)
    np.testing.assert_allclose(rec[0], fallback[0])
    assert np.asarray(n_views)[0] == 1


def test_time_weights_bias_toward_recent_views(rig):
    # Two views agree on pose A; two stale views see pose B. With strong decay
    # on the stale views the result should be near A's triangulation.
    rng = np.random.default_rng(6)
    pts_a = random_skeletons(rng, n_people=1)[0]
    pts_b = pts_a + np.array([0.5, 0.0, 0.0], np.float32)
    poses = np.stack(
        [project_np(np.asarray(rig.P[c]), pts_a) for c in range(2)]
        + [project_np(np.asarray(rig.P[c]), pts_b) for c in (2, 3)]
    )
    lam, ts = 5.0, np.array([0.0, 0.0, 3.0, 3.0], np.float32)
    weights = jnp.exp(-lam * jnp.asarray(ts))
    rec, _ = triangulate_joints(rig.P, jnp.asarray(poses), weights, jnp.ones((4, 17), bool))
    err_a = np.linalg.norm(np.asarray(rec) - pts_a, axis=-1).mean()
    err_b = np.linalg.norm(np.asarray(rec) - pts_b, axis=-1).mean()
    assert err_a < 0.05 and err_b > 0.3


def test_stale_view_depth_survives_f32(rig):
    """Regression: one fresh view + one stale view (dt=2, time weight
    e^-10 = 4.5e-5). The stale rows enter the NORMAL matrix at ~2e-9 of
    the fresh rows — below f32 rounding — so before the relative weight
    floor (TIME_WEIGHT_REL_FLOOR) the f32 solve returned an arbitrary
    point on the fresh view's ray: measured 9.2 m error where f64 SVD
    gets 6 mm, and the f64 oracle tracker minted ~half the jit's ids on
    1,000-frame soaks purely from this (docs/PERF.md round 5)."""
    rng = np.random.default_rng(11)
    pts3d = random_skeletons(rng, n_people=1)[0]
    poses = np.stack(
        [project_np(np.asarray(rig.P[c]), pts3d) for c in range(2)]
    )
    poses += rng.normal(0.0, 1.0, poses.shape)  # 1 px observation noise
    weights = jnp.exp(-5.0 * jnp.asarray([2.0, 0.0]))  # stale, fresh
    keep = jnp.ones((2, 17), bool)
    rec, n_views = triangulate_joints(rig.P[:2], jnp.asarray(poses),
                                      weights, keep)
    err = np.linalg.norm(np.asarray(rec) - pts3d, axis=-1)
    assert err.max() < 0.08, err  # was ~9 m without the floor
    assert np.all(np.asarray(n_views) == 2)


def test_pairwise_triangulation(rig):
    rng = np.random.default_rng(7)
    pts3d = random_skeletons(rng, n_people=1)[0]
    pa = project_np(np.asarray(rig.P[0]), pts3d)
    pb = project_np(np.asarray(rig.P[1]), pts3d)
    rec = triangulate_pairwise(rig.P[0], rig.P[1], jnp.asarray(pa), jnp.asarray(pb))
    np.testing.assert_allclose(np.asarray(rec), pts3d, atol=1e-2)


def test_line_point_distance(rig):
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([[1.0, 0.0, 0.0]])
    pts = jnp.array([[5.0, 3.0, 0.0], [2.0, 0.0, 4.0]])
    d = line_point_distance_3d(origin, direction, pts)
    np.testing.assert_allclose(np.asarray(d), [3.0, 4.0], atol=1e-6)


def test_adj4x4_and_smallest_eigvec():
    """Closed-form adjugate inverse-iteration vs LAPACK eigh on DLT-like
    normal matrices (the production triangulation path)."""
    import numpy as np
    import jax.numpy as jnp

    from tpupose.geometry.triangulation import (
        _smallest_eigvec_4x4,
        adj4x4,
        inv4x4,
    )

    rng = np.random.default_rng(0)
    A = rng.normal(size=(20, 4, 4))
    np.testing.assert_allclose(
        np.asarray(inv4x4(jnp.asarray(A))), np.linalg.inv(A), rtol=1e-4,
        atol=1e-5,
    )
    adj, det = adj4x4(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(det), np.linalg.det(A), rtol=1e-4)

    # DLT regime: one near-null direction.
    for i in range(50):
        rows = rng.normal(size=(8, 4))
        null = rng.normal(size=4)
        null /= np.linalg.norm(null)
        rows -= np.outer(rows @ null, null) * (1 - 1e-4)
        M = rows.T @ rows
        _, vecs = np.linalg.eigh(M)
        got = np.asarray(_smallest_eigvec_4x4(jnp.asarray(M[None]))[0])
        assert abs(got @ vecs[:, 0]) > 1 - 1e-5

    # Fully masked joint (all-zero normal matrix) must stay finite.
    z = np.asarray(_smallest_eigvec_4x4(jnp.zeros((1, 4, 4))))
    assert np.isfinite(z).all()


def test_camera_undistort_noop_parity(rig):
    # The reference Camera's undistortion hooks are no-ops
    # (src/ivclabpose.py:48-60); the rig keeps the API.
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    np.testing.assert_array_equal(rig.undistort(img), img)
    pts = np.array([[1.0, 2.0, 0.9]])
    np.testing.assert_array_equal(rig.undistort_points(pts), pts)
