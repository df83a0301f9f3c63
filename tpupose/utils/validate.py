"""Runtime validation: NaN guards and tracker-state invariants.

The reference's only robustness mechanisms are scattered numeric epsilons
(SURVEY.md §5 — `c==0 -> 1e-5`, `F += 1e-12`, `norm==0 -> 1`); those are kept
as explicit guards in the geometry kernels. This module adds the "sanitizer"
layer the TPU build promises: jittable finiteness checks via `checkify` and
host-side structural invariants for the tracker state (the masked
struct-of-arrays design has invariants the reference's Python lists enforce
implicitly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked_finite(fn, *argnames):
    """Wrap a jittable fn so it errors (via checkify) on non-finite outputs.

    Usage:
        err, out = checked_finite(step)(args...)
        err.throw()
    """

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        for leaf in jax.tree.leaves(out):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)), "non-finite value in output"
                )
        return out

    return checkify.checkify(wrapped)


def assert_tracker_invariants(state, cfg):
    """Host-side structural checks on a TrackerState (debug/testing aid)."""
    active = np.asarray(state.active)
    ids = np.asarray(state.track_id)
    counts = np.asarray(state.hist_count)
    hits = np.asarray(state.hits)
    tsu = np.asarray(state.time_since_update)
    confirmed = np.asarray(state.confirmed)

    live_ids = ids[active]
    assert len(set(live_ids.tolist())) == len(live_ids), "duplicate track ids"
    assert np.all(live_ids >= 0), "active track with unset id"
    assert np.all(live_ids < int(np.asarray(state.next_id))), "id >= next_id"
    assert np.all(counts[active] >= 1), "active track with empty history"
    assert np.all(counts <= cfg.hist_len), "history overflow"
    assert np.all(hits[active] >= 1), "active track with zero hits"
    assert np.all(tsu[active] >= 0)
    # Confirmed implies enough hits.
    assert np.all(hits[active & confirmed] >= cfg.n_init)
    # History timestamps strictly increasing within the valid range.
    ht = np.asarray(state.hist_time)
    for i in np.where(active)[0]:
        t = ht[i, : counts[i]]
        assert np.all(np.diff(t) > 0), f"non-monotonic history for slot {i}"
    poses = np.asarray(state.hist_pose)
    for i in np.where(active)[0]:
        assert np.isfinite(poses[i, : counts[i]]).all(), f"NaN pose in slot {i}"
