"""Pallas heatmap-decode kernel vs the pure-XLA decode (interpret mode on
the CPU test backend; the same kernel compiles on real TPU)."""
import numpy as np
import jax.numpy as jnp

from tpupose.ops.heatmap import decode_heatmaps
from tpupose.ops.pallas_heatmap import decode_heatmaps_pallas


def _random_heat(seed, n=3, hh=16, wh=12, j=5):
    rng = np.random.default_rng(seed)
    heat = rng.normal(scale=0.1, size=(n, hh, wh, j)).astype(np.float32)
    # plant distinct peaks
    for i in range(n):
        for k in range(j):
            y, x = rng.integers(0, hh), rng.integers(0, wh)
            heat[i, y, x, k] = 2.0 + rng.uniform()
    return heat


def test_pallas_decode_matches_xla():
    heat = _random_heat(0)
    boxes = jnp.asarray(
        np.array([[0, 0, 24, 32], [10, 5, 34, 37], [100, 50, 124, 82]], np.float32)
    )
    ref = np.asarray(decode_heatmaps(jnp.asarray(heat), boxes))
    got = np.asarray(
        decode_heatmaps_pallas(jnp.asarray(heat), boxes, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_decode_no_refine():
    heat = _random_heat(1)
    boxes = jnp.asarray(np.tile([[0, 0, 12, 16]], (3, 1)).astype(np.float32))
    ref = np.asarray(decode_heatmaps(jnp.asarray(heat), boxes, refine=False))
    got = np.asarray(
        decode_heatmaps_pallas(jnp.asarray(heat), boxes, refine=False,
                               interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
