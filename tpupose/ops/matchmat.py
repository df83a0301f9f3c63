"""Match-matrix utilities for the CSA / match-matrix person matcher.

JAX ports of the reference's `transform_closure` and `proj2dpam`
(`src/utils/calculate.py:82-145`), the core math of its match-matrix path
(referenced by the CSA_* config keys; the iterative tracker does not use
them). Both are pure, fixed-shape and jittable.

`transform_closure` deviation (documented, deliberate): the reference's
triple loop writes `temp[i][j] = X[i,j] or (X[i,k] and X[k,j])` reading only
the ORIGINAL matrix and overwriting `temp` wholesale each k, so after the
loop only k = N-1 has any effect — a de-optimized Floyd-Warshall that does
not actually compute a closure. We compute the real transitive closure
(iterated boolean matmul to fixpoint); on the symmetric, thresholded
affinity matrices the matcher feeds it, the reference's single-k result and
the true closure agree (each person clique is already near-complete), and
the true closure is the semantics the surrounding algorithm assumes.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def transform_closure(x_bin):
    """Binary relation matrix -> cluster assignment ("permutation") matrix.

    Args:
      x_bin: (N, N) bool/0-1 relation matrix.

    Returns:
      (N, N) float32 match matrix M with M[j, i] = 1 iff element j belongs
      to the cluster whose representative is i (the smallest-index row that
      first claimed j, mirroring the reference's sequential scan —
      `src/utils/calculate.py:94-103`).
    """
    x = jnp.asarray(x_bin).astype(bool)
    n = x.shape[0]

    # Transitive closure by doubling: closure = OR of powers of x.
    def double(c, _):
        c = c | (c @ c)
        return c, None

    steps = max(1, math.ceil(math.log2(max(n, 2))))
    closure, _ = jax.lax.scan(double, x, None, length=steps)

    # Sequential representative extraction (order matters: a row claims all
    # its relatives only if it was not itself claimed by an earlier row).
    def row(carry, i):
        vis, match = carry
        claim = jnp.where(vis[i], jnp.zeros(n, bool), closure[i])
        vis = vis | claim
        match = match.at[:, i].set(jnp.where(claim, 1.0, match[:, i]))
        return (vis, match), None

    vis0 = jnp.zeros(n, bool)
    match0 = jnp.zeros((n, n), jnp.float32)
    (_, match), _ = jax.lax.scan(row, (vis0, match0), jnp.arange(n))
    return match


def proj2pav(y):
    """Project a vector onto {x >= 0, sum(x) <= 1} (capped simplex),
    `src/utils/calculate.py:133-145`."""
    y = jnp.maximum(y, 0.0)
    n = y.shape[0]
    u = jnp.sort(y)[::-1]
    sv = jnp.cumsum(u)
    ks = jnp.arange(1, n + 1, dtype=y.dtype)
    to_find = u > (sv - 1.0) / ks
    # index of the LAST true entry (reference: torch.nonzero(...)[-1]).
    rho = jnp.max(jnp.where(to_find, jnp.arange(n), -1))
    rho_c = jnp.clip(rho, 0, n - 1)
    theta = jnp.maximum(0.0, (sv[rho_c] - 1.0) / (rho_c + 1.0))
    projected = jnp.maximum(y - theta, 0.0)
    return jnp.where(jnp.sum(y) < 1.0, y, projected)


def proj2dpam(y, tol=1e-4, max_iter=10):
    """Project a score matrix toward a doubly-stochastic-ish matrix by
    Dykstra-style alternating row/column capped-simplex projections
    (`src/utils/calculate.py:105-121`).

    Args:
      y: (N, M) score matrix.
    Returns:
      (N, M) projected matrix (rows and columns in [0, 1], sums <= 1).
    """
    y = jnp.asarray(y, jnp.float32)
    proj_rows = jax.vmap(proj2pav)
    proj_cols = lambda x: jax.vmap(proj2pav, in_axes=1, out_axes=1)(x)

    def cond(carry):
        _, _, it, chg = carry
        return (it < max_iter) & (chg >= tol)

    def body(carry):
        x, i2, it, _ = carry
        x1 = proj_rows(y + i2)
        i1 = x1 - (y + i2)
        x2 = proj_cols(y + i1)
        i2 = x2 - (y + i1)
        chg = jnp.mean(jnp.abs(x2 - x))
        return x2, i2, it + 1, chg

    x0 = y
    i2 = jnp.zeros_like(y)
    x, _, _, _ = jax.lax.while_loop(cond, body, (x0, i2, 0, jnp.inf))
    return x
