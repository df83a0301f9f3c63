"""Jittable linear assignment (Hungarian) solver.

The reference calls `scipy.optimize.linear_sum_assignment` inside its
per-frame loop (`src/tracking/IterativeTracker.py:79,150`). That is a host
round-trip per camera per frame — a non-starter inside a jitted/`lax.scan`
tracker on TPU. This module implements the Jonker-Volgenant shortest
augmenting path algorithm (O(R^2 C)) with `lax.while_loop`s over fixed-size
arrays, so the whole tracker stays on-device.

TPU performance note: sequential loop iterations are the expensive resource,
so `masked_lap` always orients the problem with the SMALLER dimension as the
augmenting rows (solving the transpose when needed) — e.g. assigning 4
detections into 24 hypotheses runs 4 Dijkstra passes, not 24. This cut the
tracker's init phase ~6x on v5e.

Semantics: minimize over an (R, C) block, assigning every row (R <= C after
orientation) — the same optimum as scipy's rectangular
linear_sum_assignment. Invalid rows/cols are padded with a large constant
cost; padding preserves the optimum over the real block, and callers filter
padded assignments exactly like the reference filters `affinity > 0`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

#: Fallback padding cost when a masked block has no valid entries. Real
#: padding is DYNAMIC (see `masked_lap`): a fixed huge pad (the old 1e6)
#: poisons f32 — the JV potentials mix pad-scale and cost-scale values, and
#: f32 at 1e6 resolves only ~0.06, erasing small affinity differences
#: (association scores are ~1e-2), which made the assignment among real
#: pairs effectively arbitrary.
PAD_COST = 1e6


def solve_lap(cost):
    """Solve the rectangular LAP (minimize), assigning every row.

    Args:
      cost: (R, C) float matrix with R <= C. All entries must be finite.

    Returns:
      row_of_col: (C,) int32, row assigned to each column (-1 if none).
      col_of_row: (R,) int32, column assigned to each row.
    """
    cost = jnp.asarray(cost, jnp.float32)
    R, C = cost.shape
    assert R <= C, f"solve_lap needs R <= C, got {cost.shape}"
    INF = jnp.float32(3e38)
    VIRT = C  # virtual start column

    def assign_row(i, carry):
        u, v, p = carry  # u: (R+1,) row potentials (+trash), v/p: (C+1,)
        p = p.at[VIRT].set(i)
        minv0 = jnp.full(C + 1, INF, jnp.float32)
        used0 = jnp.zeros(C + 1, bool)
        way0 = jnp.full(C + 1, VIRT, jnp.int32)

        def cond(s):
            _, _, p_, _, _, _, j0 = s
            return p_[j0] != -1

        def body(s):
            u_, v_, p_, minv, used, way, j0 = s
            used = used.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0, :] - u_[i0] - v_[:C]
            better = (cur < minv[:C]) & ~used[:C]
            minv = minv.at[:C].set(jnp.where(better, cur, minv[:C]))
            way = way.at[:C].set(jnp.where(better, j0, way[:C]))
            reach = jnp.where(used[:C], INF, minv[:C])
            j1 = jnp.argmin(reach).astype(jnp.int32)
            delta = reach[j1]
            # u[p[j]] += delta for used cols j; p injective on used cols.
            row_idx = jnp.where(used, p_, R)  # invalid -> trash slot R
            bump = jnp.zeros(R + 1, jnp.float32).at[row_idx].add(1.0)
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

    u0 = jnp.zeros(R + 1, jnp.float32)
    v0 = jnp.zeros(C + 1, jnp.float32)
    p0 = jnp.full(C + 1, -1, jnp.int32)
    _, _, p = lax.fori_loop(0, R, assign_row, (u0, v0, p0))

    row_of_col = p[:C]
    col_of_row = (
        jnp.full(R, -1, jnp.int32)
        .at[jnp.where(row_of_col >= 0, row_of_col, R)]
        .set(jnp.arange(C, dtype=jnp.int32), mode="drop")
    )
    return row_of_col, col_of_row


def masked_lap(cost, row_valid, col_valid, maximize=False):
    """LAP over a masked block of a fixed (R, C) matrix.

    Invalid rows/cols/entries are padded so real pairs are always preferred;
    the returned `col_of_row` marks assignments to invalid columns (or from
    invalid rows) as -1. The pad is scaled to the matrix — cmax + n*span + 1
    guarantees the optimum never trades a real pair for a pad (an extra pad
    cell costs more than any rearrangement of n real cells can recover)
    while keeping all arithmetic at the costs' own f32 scale.

    Args:
      cost: (R, C) costs (or scores if maximize=True).
      row_valid: (R,) bool.
      col_valid: (C,) bool.
      maximize: solve max-score assignment instead.

    Returns:
      col_of_row: (R,) int32 with -1 for unassigned/invalid rows.
    """
    c = jnp.asarray(cost, jnp.float32)
    R, C = c.shape
    if maximize:
        c = -c
    ok = row_valid[:, None] & col_valid[None, :]
    has = jnp.any(ok)
    cmax = jnp.where(has, jnp.max(jnp.where(ok, c, -jnp.inf)), 0.0)
    cmin = jnp.where(has, jnp.min(jnp.where(ok, c, jnp.inf)), 0.0)
    pad = cmax + (cmax - cmin) * min(R, C) + 1.0
    c = jnp.where(ok, c, pad)
    if R <= C:
        _, col_of_row = solve_lap(c)
    else:
        # Orient the smaller dimension as rows (fewer sequential Dijkstras);
        # the matching (and optimum) is the same by symmetry.
        row_of_col_T, _ = solve_lap(c.T)  # (R,) -> col index per row... no:
        # solve_lap(c.T) treats columns as rows; row_of_col_T[r] = the
        # transposed-row (original column) assigned to original row r.
        col_of_row = row_of_col_T
    assigned_ok = (
        row_valid
        & (col_of_row >= 0)
        & jnp.take(col_valid, jnp.clip(col_of_row, 0), axis=0)
    )
    return jnp.where(assigned_ok, col_of_row, -1)
