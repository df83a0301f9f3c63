"""Tests for the LAP solver (vs scipy) and temporal smoothing (vs scipy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter1d
from scipy.optimize import linear_sum_assignment

from tpupose.ops import masked_lap, smooth_last, smooth_last_pose, solve_lap


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16, 32])
def test_lap_matches_scipy_cost(n):
    rng = np.random.default_rng(n)
    solve = jax.jit(solve_lap)
    for trial in range(8):
        cost = rng.uniform(-10, 10, size=(n, n)).astype(np.float32)
        row_of_col, col_of_row = solve(cost)
        col_of_row = np.asarray(col_of_row)
        # Valid permutation
        assert sorted(col_of_row.tolist()) == list(range(n))
        ours = cost[np.arange(n), col_of_row].sum()
        r, c = linear_sum_assignment(cost)
        ref = cost[r, c].sum()
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref))


def test_lap_integer_costs_degenerate():
    # Many ties — still must be optimal.
    rng = np.random.default_rng(0)
    for trial in range(5):
        cost = rng.integers(0, 3, size=(10, 10)).astype(np.float32)
        _, col_of_row = solve_lap(cost)
        col_of_row = np.asarray(col_of_row)
        r, c = linear_sum_assignment(cost)
        assert cost[np.arange(10), col_of_row].sum() == cost[r, c].sum()


def test_masked_lap_rectangular():
    # 3 real rows, 2 real cols inside an 8x8 padded problem: matches scipy on
    # the rectangular block.
    rng = np.random.default_rng(1)
    for trial in range(6):
        block = rng.uniform(0, 5, size=(3, 2)).astype(np.float32)
        cost = np.zeros((8, 8), np.float32)
        cost[:3, :2] = block
        rv = np.zeros(8, bool); rv[:3] = True
        cv = np.zeros(8, bool); cv[:2] = True
        col_of_row = np.asarray(masked_lap(cost, jnp.asarray(rv), jnp.asarray(cv)))
        r, c = linear_sum_assignment(block)
        ref_pairs = {(ri, ci) for ri, ci in zip(r, c)}
        got_pairs = {(i, j) for i, j in enumerate(col_of_row[:3]) if j >= 0}
        assert len(got_pairs) == len(ref_pairs) == 2
        got_cost = sum(block[i, j] for i, j in got_pairs)
        ref_cost = block[r, c].sum()
        assert abs(got_cost - ref_cost) < 1e-4


def test_masked_lap_maximize_prefers_high_affinity():
    aff = np.array([[0.9, 0.1], [0.2, 0.8]], np.float32)
    cost = np.zeros((4, 4), np.float32)
    cost[:2, :2] = aff
    rv = np.array([True, True, False, False])
    cv = np.array([True, True, False, False])
    col_of_row = np.asarray(masked_lap(cost, jnp.asarray(rv), jnp.asarray(cv), maximize=True))
    assert col_of_row[0] == 0 and col_of_row[1] == 1


@pytest.mark.parametrize("sigma", [0.3, 0.6, 0.8])
@pytest.mark.parametrize("count", [1, 2, 3, 5, 11])
def test_smooth_last_matches_scipy(sigma, count):
    rng = np.random.default_rng(int(sigma * 10) + count)
    H = 12
    hist = rng.normal(size=(H, 17, 3)).astype(np.float32)
    ref = gaussian_filter1d(hist[:count], sigma=sigma, axis=0, mode="reflect")[-1]
    ours = np.asarray(smooth_last(jnp.asarray(hist), jnp.int32(count), sigma))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_smooth_last_pose_groups():
    # Mirrors the reference's split: joints 9,10 smoothed with arm_sigma,
    # the rest with sigma (`IterativeTracker.py:380-382`).
    rng = np.random.default_rng(3)
    hist = rng.normal(size=(12, 17, 3)).astype(np.float32)
    count = 7
    ref = hist[:count].copy()
    body = gaussian_filter1d(ref, sigma=0.6, axis=0, mode="reflect")[-1]
    arms = gaussian_filter1d(ref, sigma=0.8, axis=0, mode="reflect")[-1]
    expected = body.copy()
    expected[[9, 10]] = arms[[9, 10]]
    ours = np.asarray(smooth_last_pose(jnp.asarray(hist), jnp.int32(count), 0.6, 0.8))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_smooth_under_jit_and_vmap():
    hist = jnp.asarray(np.random.default_rng(4).normal(size=(5, 12, 17, 3)).astype(np.float32))
    counts = jnp.array([1, 3, 5, 12, 7], jnp.int32)
    fn = jax.jit(jax.vmap(lambda h, c: smooth_last_pose(h, c, 0.3, 0.8)))
    out = fn(hist, counts)
    assert out.shape == (5, 17, 3)
    ref0 = gaussian_filter1d(np.asarray(hist[0][:1]), 0.3, axis=0, mode="reflect")[-1]
    np.testing.assert_allclose(np.asarray(out[0])[:9], ref0[:9], rtol=1e-4, atol=1e-5)
