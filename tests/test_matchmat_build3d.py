"""Tests for the match-matrix helpers (`transform_closure`, `proj2dpam` —
reference `src/utils/calculate.py:82-145`) and the alternative BUILD_3D
kernels (`top_down_pose_kernel` min-reprojection pair selection +
`get_single_human3d` fusion — `src/utils/construction.py:9-31`,
`src/tracking/hypothesis.py:153-180`)."""
import numpy as np
import jax.numpy as jnp

from tpupose.geometry import (
    fuse_pairwise_humans,
    make_camera_set,
    triangulate_pairwise,
    triangulate_top_down,
)
from tpupose.ops import proj2dpam, proj2pav, transform_closure
from tpupose.data.synthetic import camera_ring


# -- transform_closure --------------------------------------------------------

def _closure_extract_np(x):
    """Numpy transcription of the reference's representative scan
    (`calculate.py:94-103`) applied to a true transitive closure."""
    n = len(x)
    closure = x.astype(bool).copy()
    for _ in range(n):
        closure = closure | (closure @ closure)
    vis = np.zeros(n, bool)
    match = np.zeros((n, n), np.float32)
    for i in range(n):
        if vis[i]:
            continue
        for j in range(n):
            if closure[i, j]:
                vis[j] = True
                match[j, i] = 1.0
    return match


def test_transform_closure_clusters():
    # Two cliques {0, 2} and {1, 3, 4} linked transitively (1-3, 3-4).
    x = np.eye(5, dtype=bool)
    x[0, 2] = x[2, 0] = True
    x[1, 3] = x[3, 1] = True
    x[3, 4] = x[4, 3] = True
    got = np.asarray(transform_closure(jnp.asarray(x)))
    expect = _closure_extract_np(x)
    np.testing.assert_array_equal(got, expect)
    # Cluster representatives are the smallest member indices: 0 and 1.
    assert got[2, 0] == 1.0 and got[4, 1] == 1.0 and got[3, 1] == 1.0
    # Every element belongs to exactly one representative column.
    np.testing.assert_array_equal(got.sum(axis=1), np.ones(5))


def test_transform_closure_random_symmetric():
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.uniform(size=(7, 7))
        x = ((a + a.T) / 2 > 0.6) | np.eye(7, dtype=bool)
        got = np.asarray(transform_closure(jnp.asarray(x)))
        np.testing.assert_array_equal(got, _closure_extract_np(x))


# -- proj2dpam ----------------------------------------------------------------

def test_proj2pav_cases():
    # sum < 1: unchanged (negatives clamped first).
    np.testing.assert_allclose(
        np.asarray(proj2pav(jnp.array([0.5, 0.3, -0.2]))), [0.5, 0.3, 0.0]
    )
    # sum > 1: euclidean projection onto the simplex.
    np.testing.assert_allclose(
        np.asarray(proj2pav(jnp.array([2.0, 0.0]))), [1.0, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(proj2pav(jnp.array([0.8, 0.8]))), [0.5, 0.5], atol=1e-6
    )


def _proj2pav_np(y):
    y = np.maximum(np.asarray(y, np.float64), 0.0)
    if y.sum() < 1.0:
        return y
    u = np.sort(y)[::-1]
    sv = np.cumsum(u)
    rho = np.nonzero(u > (sv - 1) / np.arange(1, len(u) + 1))[0][-1]
    theta = max(0.0, (sv[rho] - 1) / (rho + 1))
    return np.maximum(y - theta, 0.0)


def _proj2dpam_np(y, tol=1e-4):
    """Direct numpy transcription of the reference's Dykstra loop
    (`calculate.py:105-131`)."""
    x0 = np.asarray(y, np.float64)
    x = x0.copy()
    i2 = np.zeros_like(x0)
    for _ in range(10):
        x1 = np.stack([_proj2pav_np(r) for r in (x0 + i2)])
        i1 = x1 - (x0 + i2)
        x2 = np.stack([_proj2pav_np(c) for c in (x0 + i1).T]).T
        i2 = x2 - (x0 + i1)
        chg = np.abs(x2 - x).mean()
        x = x2
        if chg < tol:
            return x
    return x


def test_proj2dpam_matches_reference_transcription():
    rng = np.random.default_rng(1)
    for _ in range(4):
        y = rng.uniform(0, 1.5, size=(5, 4))
        got = np.asarray(proj2dpam(jnp.asarray(y)))
        np.testing.assert_allclose(got, _proj2dpam_np(y), atol=1e-5)


def test_proj2dpam_constraints():
    rng = np.random.default_rng(2)
    y = rng.uniform(0, 2.0, size=(6, 6))
    x = np.asarray(proj2dpam(jnp.asarray(y)))
    assert (x >= -1e-6).all()
    assert (x.sum(axis=0) <= 1.0 + 1e-4).all()
    assert (x.sum(axis=1) <= 1.0 + 1e-4).all()


# -- BUILD_3D alternative kernels ----------------------------------------------

def _ring():
    P, K, RT = camera_ring(num_cameras=4)
    return make_camera_set(P, K, RT, 1280, 720)


def _project_np(P, pts3d):
    hom = np.concatenate([pts3d, np.ones_like(pts3d[..., :1])], axis=-1)
    proj = np.einsum("ij,...j->...i", P, hom)
    return proj[..., :2] / proj[..., 2:3]


def test_triangulate_top_down_recovers_points():
    cams = _ring()
    P = np.asarray(cams.P, np.float64)
    rng = np.random.default_rng(0)
    pts3d = rng.uniform(-1, 1, size=(17, 3)) + [0, 0, 1.2]
    poses = np.stack([_project_np(P[v], pts3d) for v in range(4)])
    w2d = np.full((4, 17), 0.9)
    pose, w = triangulate_top_down(
        jnp.asarray(cams.P), jnp.asarray(poses, np.float32), jnp.asarray(w2d)
    )
    np.testing.assert_allclose(np.asarray(pose), pts3d, atol=2e-2)
    np.testing.assert_allclose(np.asarray(w), 0.9, atol=1e-6)


def test_triangulate_top_down_picks_clean_pair():
    """A corrupted view poisons every pair containing it; the min-error pair
    must therefore be one of the clean pairs, and the result accurate."""
    cams = _ring()
    P = np.asarray(cams.P, np.float64)
    pts3d = np.array([[0.2, -0.1, 1.0], [0.0, 0.3, 1.5]])
    poses = np.stack([_project_np(P[v], pts3d) for v in range(4)])
    poses[2] += 80.0  # corrupt camera 2
    w2d = np.stack([np.full(2, 0.5 + 0.1 * v) for v in range(4)])
    pose, w = triangulate_top_down(
        jnp.asarray(cams.P), jnp.asarray(poses, np.float32), jnp.asarray(w2d)
    )
    np.testing.assert_allclose(np.asarray(pose), pts3d, atol=5e-2)
    # Winning pair excludes view 2 -> its weight is a mean of two of
    # {0.5, 0.6, 0.8} (never 0.7 = mean with view 2's weight in it ... but
    # 0.65 = (0.5+0.8)/2 etc.); just check view-2's weight isn't inflating it.
    assert np.all(np.asarray(w) <= 0.71)


def test_triangulate_top_down_view_valid_mask():
    cams = _ring()
    P = np.asarray(cams.P, np.float64)
    pts3d = np.array([[0.1, 0.1, 1.1]])
    poses = np.stack([_project_np(P[v], pts3d) for v in range(4)])
    poses[3] = 1e5  # garbage, but masked out
    w2d = np.ones((4, 1))
    pose, _ = triangulate_top_down(
        jnp.asarray(cams.P), jnp.asarray(poses, np.float32), jnp.asarray(w2d),
        view_valid=jnp.array([True, True, True, False]),
    )
    np.testing.assert_allclose(np.asarray(pose), pts3d, atol=2e-2)


def test_fuse_pairwise_humans_formula():
    """Hand-check of the cost-weighted sum (`hypothesis.py:163-178`)."""
    points = np.array(
        [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
         [[3.0, 0.0, 0.0], [0.0, 3.0, 0.0]]]
    )  # (2 candidates, 2 joints, 3)
    valid = np.array([[True, True], [True, False]])
    weights = np.array([[0.9, 0.8], [0.5, 0.4]])
    costs = np.array([1.0, 3.0])
    human, w3d, jv = fuse_pairwise_humans(
        jnp.asarray(points), jnp.asarray(valid), jnp.asarray(weights),
        jnp.asarray(costs),
    )
    total = 4.0
    w0 = (total - 1.0) / (total * 1)  # 0.75
    w1 = (total - 3.0) / (total * 1)  # 0.25
    np.testing.assert_allclose(
        np.asarray(human)[0], points[0, 0] * w0 + points[1, 0] * w1, atol=1e-6
    )
    # joint 1 only contributed by candidate 0 (still cost-weighted, as in the
    # reference: the weight is per-person, not renormalized per joint).
    np.testing.assert_allclose(np.asarray(human)[1], points[0, 1] * w0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w3d), [(0.9 + 0.5) / 2, 0.8], atol=1e-6)
    assert np.asarray(jv).all()


def test_fuse_pairwise_single_candidate_passthrough():
    points = np.array([[[1.0, 2.0, 3.0]]])
    human, w3d, jv = fuse_pairwise_humans(
        jnp.asarray(points), jnp.ones((1, 1), bool), jnp.full((1, 1), 0.7),
        jnp.array([5.0]),
    )
    np.testing.assert_allclose(np.asarray(human), points[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w3d), [0.7], atol=1e-6)


def test_build3d_registry_has_both_kernels():
    import tpupose.pipeline.registry_defs  # noqa: F401 — populates registries
    from tpupose.geometry import triangulate_joints
    from tpupose.utils.registry import BUILD_3D_KERNELS

    assert BUILD_3D_KERNELS.get("SVD")() is triangulate_joints
    assert BUILD_3D_KERNELS.get("TopDown")() is triangulate_top_down
    assert set(BUILD_3D_KERNELS.names()) >= {"svd", "topdown"}
