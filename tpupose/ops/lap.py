"""Jittable linear assignment (Hungarian) solver.

The reference calls `scipy.optimize.linear_sum_assignment` inside its
per-frame loop (`src/tracking/IterativeTracker.py:79,150`). That is a host
round-trip per camera per frame — a non-starter inside a jitted/`lax.scan`
tracker on TPU. This module implements the Jonker-Volgenant shortest
augmenting path algorithm (O(N^3)) with `lax.while_loop`s over fixed-size
arrays, so the whole tracker can stay on-device.

Semantics: square minimization. Rectangular/masked problems are padded with a
large constant cost (`pad_cost`); padding preserves the optimum over the real
block (standard LAP padding argument), and callers filter padded/invalid
assignments exactly like the reference filters `affinity > 0` matches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

#: Cost used for padded (invalid) entries. Large enough to never be preferred
#: over any real cost, small enough to keep f32 arithmetic exact-ish.
PAD_COST = 1e6


def solve_lap(cost):
    """Solve the square linear assignment problem (minimization).

    Args:
      cost: (N, N) float matrix. All entries must be finite.

    Returns:
      row_of_col: (N,) int32, row assigned to each column.
      col_of_row: (N,) int32, column assigned to each row.

    The assignment is a minimum-cost perfect matching (same optimum as
    scipy.optimize.linear_sum_assignment on the same matrix).
    """
    cost = jnp.asarray(cost, jnp.float32)
    N = cost.shape[0]
    INF = jnp.float32(3e38)
    VIRT = N  # virtual start column

    def assign_row(i, carry):
        u, v, p = carry  # u: (N+1,) row potentials (+trash), v: (N+1,) col
        p = p.at[VIRT].set(i)
        minv0 = jnp.full(N + 1, INF, jnp.float32)
        used0 = jnp.zeros(N + 1, bool)
        way0 = jnp.full(N + 1, VIRT, jnp.int32)

        def cond(s):
            _, _, p_, _, _, _, j0 = s
            return p_[j0] != -1

        def body(s):
            u_, v_, p_, minv, used, way, j0 = s
            used = used.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0, :] - u_[i0] - v_[:N]
            better = (cur < minv[:N]) & ~used[:N]
            minv = minv.at[:N].set(jnp.where(better, cur, minv[:N]))
            way = way.at[:N].set(jnp.where(better, j0, way[:N]))
            reach = jnp.where(used[:N], INF, minv[:N])
            j1 = jnp.argmin(reach).astype(jnp.int32)
            delta = reach[j1]
            # u[p[j]] += delta for used cols j; p injective on used cols.
            row_idx = jnp.where(used, p_, N)  # invalid -> trash slot N
            bump = jnp.zeros(N + 1, jnp.float32).at[row_idx].add(1.0)
            u_ = u_ + delta * bump
            v_ = v_ - delta * used.astype(jnp.float32)
            minv = jnp.where(used, minv, minv - delta)
            return (u_, v_, p_, minv, used, way, j1)

        u, v, p, _, _, way, j0 = lax.while_loop(
            cond, body, (u, v, p, minv0, used0, way0, jnp.int32(VIRT))
        )

        # Augment along the alternating path back to the virtual column.
        def aug_cond(s):
            return s[0] != VIRT

        def aug_body(s):
            j0_, p_ = s
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (j1, p_)

        _, p = lax.while_loop(aug_cond, aug_body, (j0, p))
        return (u, v, p)

    u0 = jnp.zeros(N + 1, jnp.float32)
    v0 = jnp.zeros(N + 1, jnp.float32)
    p0 = jnp.full(N + 1, -1, jnp.int32)
    _, _, p = lax.fori_loop(0, N, assign_row, (u0, v0, p0))

    row_of_col = p[:N]
    col_of_row = (
        jnp.full(N, -1, jnp.int32)
        .at[jnp.where(row_of_col >= 0, row_of_col, 0)]
        .set(jnp.arange(N, dtype=jnp.int32))
    )
    return row_of_col, col_of_row


def masked_lap(cost, row_valid, col_valid, maximize=False):
    """LAP over a masked rectangular block inside a fixed (N, N) matrix.

    Invalid rows/cols/entries are padded with PAD_COST so real pairs are
    always preferred; the returned `col_of_row` marks assignments to invalid
    columns (or from invalid rows) as -1.

    Args:
      cost: (N, N) costs (or scores if maximize=True).
      row_valid: (N,) bool.
      col_valid: (N,) bool.
      maximize: solve max-score assignment instead.

    Returns:
      col_of_row: (N,) int32 with -1 for unassigned/invalid rows.
    """
    c = jnp.asarray(cost, jnp.float32)
    if maximize:
        c = -c
    ok = row_valid[:, None] & col_valid[None, :]
    c = jnp.where(ok, c, PAD_COST)
    _, col_of_row = solve_lap(c)
    assigned_ok = (
        row_valid
        & (col_of_row >= 0)
        & jnp.take(col_valid, jnp.clip(col_of_row, 0), axis=0)
    )
    return jnp.where(assigned_ok, col_of_row, -1)
