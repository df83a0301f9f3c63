"""Fixed-capacity, fully jittable multi-view 3D pose tracker.

TPU-first re-design of the reference's `IterativeTracker` + `IterTrack` +
`Hypothesis` (`src/tracking/IterativeTracker.py`, `src/tracking/hypothesis.py`):
instead of dynamic Python lists of track objects, tracker state is a
struct-of-arrays pytree with static capacities (MAX_TRACKS, MAX_DETS,
MAX_HYP) and validity masks, so a whole frame step compiles to one XLA
program and clips run under `lax.scan`. Semantics are specified by — and
tested for equality against — `tpupose.tracking.oracle.OracleTracker`.

Design notes (SURVEY.md §7 "hard parts"):
  * association is vmapped over cameras (the reference's per-camera loop
    reads only pre-frame state, so cameras are independent);
  * the per-track 3D update is vmapped over track slots;
  * Hungarian assignment runs on-device (`tpupose.ops.lap`);
  * the data-dependent greedy loops (per-joint view dropping, hypothesis
    veto/merge) become fixed-iteration masked updates (<= C(C-1)/2 pairs,
    <= C cameras).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.geometry import (
    CameraSet,
    back_project_rays,
    epipolar_distance_matrix,
    line_point_distance_3d,
    project_points,
    triangulate_joints,
)
from tpupose.ops import masked_lap, smooth_last_pose

NEVER = np.int32(-(10**8))  # "no 2D pose stored" timestamp sentinel

#: The reference hardcodes the association joint gate to 10 for every dataset
#: (`src/tracking/IterativeTracker.py:145`) even though its own comment says
#: Campus should use 14. We default to the shipped value and let configs
#: select the Campus variant via the JOINT_GATE YAML key.
REFERENCE_JOINT_GATE = 10
CAMPUS_JOINT_GATE = 14


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Static tracker configuration (hashable -> usable as a jit static arg).

    Hyper-parameters mirror the YAML PERSON_MATCHERS.ITERATIVE block
    (SURVEY.md §2.1); capacities are new (the reference uses unbounded
    Python lists).
    """

    num_cameras: int
    num_joints: int = 17
    max_tracks: int = 16
    max_dets: int = 16
    max_hyp: int = 40
    hist_len: int = 12
    conf_threshold: float = 0.4
    epi_threshold: float = 25.0
    init_threshold: float = 15.0
    joint_threshold: float = 15.0
    n_init: int = 3
    max_age: int = 10
    alpha2d: float = 30.0
    lambda_a: float = 3.0
    lambda_t: float = 5.0
    sigma: float = 0.6
    arm_sigma: float = 0.8
    joint_gate: int = 10
    update_window: int = 3
    arm_joints: tuple = (9, 10)
    #: Track resurrection (new, no reference counterpart — the reference
    #: mints a fresh id whenever a person re-emerges after max_age frames of
    #: occlusion, `src/tracking/IterativeTracker.py:108-113`). When > 0, a
    #: new hypothesis spawning near a recently-deleted CONFIRMED track's last
    #: pose reuses that track's id (and confirmed status) instead, for up to
    #: `resurrect_window` frames after the deletion. The gate is mean joint
    #: distance < resurrect_dist + resurrect_speed * (frames since the
    #: track's last update) — a motion budget, because a person keeps walking
    #: while occluded (constant-velocity extrapolation measured WORSE than
    #: the last pose on curved paths; see tests/test_resurrect.py). 0 = off
    #: (reference parity, the default).
    resurrect_window: int = 0
    resurrect_dist: float = 0.5
    resurrect_speed: float = 0.06  # meters/frame (~1.5 m/s at 25 fps)
    #: Deterministic near-tie association resolution (new, documented
    #: deviation): when > 0, each (track, detection) pair with positive
    #: affinity gets a bias of tie_eps * hash(track_id) * g(det position)
    #: added BEFORE the assignment solve (acceptance still uses the
    #: unbiased affinity). Without it, competing pairs whose affinities
    #: differ by less than f32 rounding noise (~1e-6 at the affinity
    #: scale) are resolved by that noise — randomly per frame — and each
    #: flip can cost a missed update and eventually a delete + re-birth
    #: (measured: the jit mints 2-3x the f64 oracle's ids on 1,000-frame
    #: streams, docs/API.md). The bias is keyed on the persistent track
    #: id and the detection's image position (stable across frames and
    #: detection-order shuffles), so near-ties resolve the same way every
    #: frame. At the default 3e-3 the bias can only override affinity
    #: differences below ~7e-3 — genuinely ambiguous pairs (association
    #: affinities live in [0, 1]). Measured on the 1,000-frame soak
    #: (scripts/tie_churn_sweep.py): id-switches 14 -> 12, MOTA +0.002,
    #: identical minted ids, with the f64 oracle (same bias) in lockstep.
    #: 0 = off. YAML key TIE_EPS.
    tie_eps: float = 3e-3


class TrackerState(NamedTuple):
    """Struct-of-arrays track store. T = max_tracks, C = cameras, J = joints,
    H = hist_len."""

    active: jnp.ndarray       # (T,) bool
    confirmed: jnp.ndarray    # (T,) bool
    track_id: jnp.ndarray     # (T,) int32
    hits: jnp.ndarray         # (T,) int32
    time_since_update: jnp.ndarray  # (T,) int32
    already_update: jnp.ndarray     # (T,) bool
    pose2d: jnp.ndarray       # (T, C, J, 3) latest 2D pose per camera (x, y, s)
    pose2d_time: jnp.ndarray  # (T, C) int32, NEVER if unset
    hist_pose: jnp.ndarray    # (T, H, J, 3) chronological 3D history
    hist_time: jnp.ndarray    # (T, H) int32
    hist_count: jnp.ndarray   # (T,) int32 (>= 1 for active)
    last_n_views: jnp.ndarray  # (T, J) int32
    velocity: jnp.ndarray     # (T, J, 3)
    next_id: jnp.ndarray      # () int32
    # Graveyard ring of recently-deleted confirmed tracks (resurrection;
    # inert when TrackerConfig.resurrect_window == 0). G = max_tracks.
    grave_id: jnp.ndarray     # (G,) int32, -1 = empty
    grave_pose: jnp.ndarray   # (G, J, 3) last smoothed 3D pose
    grave_time: jnp.ndarray   # (G,) int32 last-update frame (motion-budget origin)
    grave_del: jnp.ndarray    # (G,) int32 deletion frame (window origin)
    grave_ptr: jnp.ndarray    # () int32 ring write cursor


class FrameOutput(NamedTuple):
    """Per-frame harvest: confirmed, just-updated tracks
    (`src/ivclabpose.py:259-287`)."""

    valid: jnp.ndarray      # (T,) bool
    track_id: jnp.ndarray   # (T,) int32
    pose3d: jnp.ndarray     # (T, J, 3)
    n_views: jnp.ndarray    # (T, J) int32
    pose2d: jnp.ndarray     # (T, C, J, 3)
    pose2d_now: jnp.ndarray  # (T, C) bool — 2D pose is from this frame


def init_state(cfg: TrackerConfig) -> TrackerState:
    T, C, J, H = cfg.max_tracks, cfg.num_cameras, cfg.num_joints, cfg.hist_len
    return TrackerState(
        active=jnp.zeros(T, bool),
        confirmed=jnp.zeros(T, bool),
        track_id=jnp.full(T, -1, jnp.int32),
        hits=jnp.zeros(T, jnp.int32),
        time_since_update=jnp.zeros(T, jnp.int32),
        already_update=jnp.zeros(T, bool),
        pose2d=jnp.zeros((T, C, J, 3), jnp.float32),
        pose2d_time=jnp.full((T, C), NEVER, jnp.int32),
        hist_pose=jnp.zeros((T, H, J, 3), jnp.float32),
        hist_time=jnp.full((T, H), NEVER, jnp.int32),
        hist_count=jnp.zeros(T, jnp.int32),
        last_n_views=jnp.zeros((T, J), jnp.int32),
        velocity=jnp.zeros((T, J, 3), jnp.float32),
        next_id=jnp.int32(0),
        grave_id=jnp.full(T, -1, jnp.int32),
        grave_pose=jnp.zeros((T, J, 3), jnp.float32),
        grave_time=jnp.full(T, NEVER, jnp.int32),
        grave_del=jnp.full(T, NEVER, jnp.int32),
        grave_ptr=jnp.int32(0),
    )


def _last_hist(state: TrackerState):
    """Latest 3D pose + its timestamp per track slot."""
    idx = jnp.maximum(state.hist_count - 1, 0)
    pose = jnp.take_along_axis(
        state.hist_pose, idx[:, None, None, None], axis=1
    )[:, 0]
    time = jnp.take_along_axis(state.hist_time, idx[:, None], axis=1)[:, 0]
    return pose, time


# --------------------------------------------------------------------------
# Phase 1: per-camera association (IterativeTracker.py:132-167)
# --------------------------------------------------------------------------

def _associate(cfg: TrackerConfig, cams: CameraSet, state: TrackerState,
               dets, det_mask, frame_id):
    """Returns (matched (C, T) bool, match_col (C, T) int32,
    unmatched (C, D) bool)."""
    tracks_pose, last_time = _last_hist(state)
    dt = jnp.where(state.active, frame_id - last_time, 1).astype(jnp.float32)
    # Golden-ratio hash of the persistent id: well-separated in [0, 1),
    # identical in the f64 oracle (oracle.py association) so both resolve
    # near-ties the same way. See TrackerConfig.tie_eps.
    tie_fid = jnp.mod(
        state.track_id.astype(jnp.float32) * 0.6180339887498949, 1.0
    )

    def per_cam(P_c, dets_c, mask_c):
        reproj = project_points(P_c, tracks_pose)  # (T, J, 2)
        d = jnp.linalg.norm(
            reproj[:, None, :, :] - dets_c[None, :, :, :2], axis=-1
        )  # (T, D, J)
        scores = 1.0 - d / (cfg.alpha2d * dt[:, None, None])
        pos = scores > 0
        npos = jnp.sum(pos, axis=-1)
        aff = jnp.sum(jnp.where(pos, scores, 0.0), axis=-1) / jnp.maximum(npos, 1)
        aff = jnp.where(npos > cfg.joint_gate, aff, 0.0)
        aff = aff / jnp.exp(cfg.lambda_a * dt[:, None])
        if cfg.tie_eps > 0.0:
            # position key: smooth in time, invariant to detection-order
            # shuffling; unwrapped (no frac) so it never jumps
            g = (jnp.mean(dets_c[:, :, 0], axis=-1) * 1e-3
                 + jnp.mean(dets_c[:, :, 1], axis=-1) * 1.3e-3)  # (D,)
            bias = cfg.tie_eps * tie_fid[:, None] * g[None, :]
            aff_sel = jnp.where(aff > 0, aff + bias, aff)
        else:
            aff_sel = aff
        col = masked_lap(aff_sel, state.active, mask_c, maximize=True)
        got = jnp.take_along_axis(
            aff, jnp.clip(col, 0, cfg.max_dets - 1)[:, None], axis=1
        )[:, 0]
        matched = (col >= 0) & (got > 0.0)
        # Detections claimed by an accepted match are no longer unmatched.
        claimed = jnp.zeros(cfg.max_dets, bool).at[
            jnp.where(matched, col, cfg.max_dets)
        ].set(True, mode="drop")
        return matched, jnp.where(matched, col, -1), mask_c & ~claimed

    return jax.vmap(per_cam)(cams.P, dets, det_mask)


def _apply_matches(state: TrackerState, dets, matched, match_col, frame_id):
    """Write matched detections into the per-camera 2D store."""
    # gather detected poses: sel[c, t] = dets[c, match_col[c, t]]
    sel = jnp.take_along_axis(
        dets, jnp.clip(match_col, 0)[:, :, None, None], axis=1
    )  # (C, T, J, 3)
    m_ct = matched[:, :, None, None]
    pose2d = jnp.where(jnp.swapaxes(m_ct, 0, 1), jnp.swapaxes(sel, 0, 1), state.pose2d)
    pose2d_time = jnp.where(matched.T, frame_id, state.pose2d_time)
    already = state.already_update | jnp.any(matched, axis=0)
    return state._replace(
        pose2d=pose2d, pose2d_time=pose2d_time, already_update=already
    )


# --------------------------------------------------------------------------
# Phase 2: per-track 3D update (IterativeTracker.py:305-395)
# --------------------------------------------------------------------------

def _greedy_update_keep(cfg, aff, raydist, view_valid):
    """Per-joint greedy view dropping, mode='update'
    (matching.py:243-277): for upper-triangle pairs (row-major) with
    affinity < 0, drop the view whose back-projection ray is farther from the
    motion-predicted joint. Vectorized over joints; pair loop is static."""
    C = cfg.num_cameras
    keep = jnp.tile(view_valid[:, None], (1, cfg.num_joints))
    for r in range(C):
        for c in range(r + 1, C):
            conflict = (aff[r, c] < 0) & keep[r] & keep[c]
            drop_r = raydist[r] > raydist[c]
            keep = keep.at[r].set(keep[r] & ~(conflict & drop_r))
            keep = keep.at[c].set(keep[c] & ~(conflict & ~drop_r))
    return keep


def _greedy_init_keep(cfg, aff, member):
    """mode='init' (matching.py:286-294): drop the view with the smaller
    affinity row-sum (sums fixed upfront, over member columns)."""
    C = cfg.num_cameras
    row_sums = jnp.sum(jnp.where(member[None, :, None], aff, 0.0), axis=1)  # (C, J)
    keep = jnp.tile(member[:, None], (1, cfg.num_joints))
    for r in range(C):
        for c in range(r + 1, C):
            conflict = (aff[r, c] < 0) & keep[r] & keep[c]
            drop_c = row_sums[r] > row_sums[c]
            keep = keep.at[c].set(keep[c] & ~(conflict & drop_c))
            keep = keep.at[r].set(keep[r] & ~(conflict & ~drop_c))
    return keep


def _update_tracks(cfg: TrackerConfig, cams: CameraSet, state: TrackerState,
                   frame_id):
    J = cfg.num_joints

    def one(active, already, pose2d, pose2d_time, hist_pose, hist_time,
            hist_count, velocity, confirmed, hits, tsu, last_n_views):
        dt_c = (frame_id - pose2d_time).astype(jnp.int32)  # (C,)
        view_valid = dt_c <= cfg.update_window
        n_valid = jnp.sum(view_valid)
        can = active & already & (n_valid >= 2)

        last_idx = jnp.maximum(hist_count - 1, 0)
        last_pose = jnp.take(hist_pose, last_idx, axis=0)
        last_time = jnp.take(hist_time, last_idx, axis=0)
        next_pose = last_pose + velocity * (frame_id - last_time).astype(jnp.float32)

        D, _ = epipolar_distance_matrix(cams.F, pose2d, valid=view_valid)
        aff = 1.0 - D / cfg.joint_threshold  # (C, C, J); masked pairs -> 1

        dirs = back_project_rays(cams.rk_inv, pose2d[..., :2])  # (C, J, 3)
        raydist = line_point_distance_3d(
            cams.center[:, None, :], dirs, next_pose[None, :, :]
        )  # (C, J)

        keep = _greedy_update_keep(cfg, aff, raydist, view_valid)
        n_views = jnp.sum(keep, axis=0).astype(jnp.int32)  # (J,)
        fail = jnp.sum(n_views < 2)
        ok = can & (fail * 3 <= J)

        weights = jnp.where(view_valid, jnp.exp(-cfg.lambda_t * dt_c), 0.0)
        pose3d, _ = triangulate_joints(
            cams.P, pose2d[..., :2], weights, keep, fallback=next_pose
        )

        # Smooth over history + candidate (IterativeTracker.py:371-383).
        ext_pose = jnp.concatenate(
            [hist_pose, jnp.zeros((1, J, 3), hist_pose.dtype)], axis=0
        )
        ext_pose = jax.lax.dynamic_update_index_in_dim(
            ext_pose, pose3d, hist_count, axis=0
        )
        smoothed = smooth_last_pose(
            ext_pose, hist_count + 1, cfg.sigma, cfg.arm_sigma, cfg.arm_joints
        )

        # Append + span-based prune (IterativeTracker.py:330-332).
        new_hist_pose = jax.lax.dynamic_update_index_in_dim(
            hist_pose, smoothed, jnp.minimum(hist_count, cfg.hist_len - 1), axis=0
        )
        new_hist_time = jax.lax.dynamic_update_index_in_dim(
            hist_time, jnp.int32(frame_id), jnp.minimum(hist_count, cfg.hist_len - 1),
            axis=0,
        )
        new_count = hist_count + 1
        span_over = frame_id - new_hist_time[0] > cfg.max_age
        shifted_pose = jnp.roll(new_hist_pose, -1, axis=0)
        shifted_time = jnp.roll(new_hist_time, -1, axis=0)
        new_hist_pose = jnp.where(span_over, shifted_pose, new_hist_pose)
        new_hist_time = jnp.where(span_over, shifted_time, new_hist_time)
        new_count = jnp.where(span_over, new_count - 1, new_count)

        # Velocity = mean of up to 5 most recent history diffs
        # (IterativeTracker.py:385-395).
        diffs = new_hist_pose[1:] - new_hist_pose[:-1]  # (H-1, J, 3)
        i = jnp.arange(cfg.hist_len - 1)
        dmask = (i >= new_count - 6) & (i <= new_count - 2)
        n_diffs = jnp.maximum(jnp.sum(dmask), 1)
        new_velocity = jnp.sum(
            jnp.where(dmask[:, None, None], diffs, 0.0), axis=0
        ) / n_diffs

        # Select: success vs failure (mark_missed, IterativeTracker.py:268-274).
        hist_pose = jnp.where(ok, new_hist_pose, hist_pose)
        hist_time = jnp.where(ok, new_hist_time, hist_time)
        hist_count = jnp.where(ok, new_count, hist_count)
        velocity = jnp.where(ok, new_velocity, velocity)
        last_n_views = jnp.where(ok, n_views, last_n_views)
        hits = jnp.where(ok, hits + 1, hits)
        tsu = jnp.where(ok, 0, tsu)
        newly_confirmed = ok & ~confirmed & (hits >= cfg.n_init)
        confirmed = confirmed | newly_confirmed
        deleted = active & ~ok & (
            (~confirmed & ~already) | (tsu >= cfg.max_age)
        )
        active = active & ~deleted
        return (active, confirmed, hits, tsu, hist_pose, hist_time, hist_count,
                velocity, last_n_views, deleted)

    (active, confirmed, hits, tsu, hist_pose, hist_time, hist_count, velocity,
     last_n_views, deleted) = jax.vmap(one)(
        state.active, state.already_update, state.pose2d, state.pose2d_time,
        state.hist_pose, state.hist_time, state.hist_count, state.velocity,
        state.confirmed, state.hits, state.time_since_update, state.last_n_views,
    )
    state = state._replace(
        active=active, confirmed=confirmed, hits=hits, time_since_update=tsu,
        hist_pose=hist_pose, hist_time=hist_time, hist_count=hist_count,
        velocity=velocity, last_n_views=last_n_views,
    )
    if cfg.resurrect_window > 0:
        state = _bury_tracks(cfg, state, deleted & confirmed, frame_id)
    return state


def _bury_tracks(cfg: TrackerConfig, state: TrackerState, push, frame_id):
    """Push deleted confirmed tracks into the graveyard ring (resurrection).

    Deleted slots keep their pre-deletion history/velocity (the failed-update
    branch leaves them untouched), so the last pose, its timestamp and the
    constant-velocity estimate are read straight off the state."""
    G = cfg.max_tracks
    last_pose, last_time = _last_hist(state)
    rank = jnp.cumsum(push) - 1
    pos = jnp.where(push, (state.grave_ptr + rank) % G, G)  # G -> dropped
    return state._replace(
        grave_id=state.grave_id.at[pos].set(state.track_id, mode="drop"),
        grave_pose=state.grave_pose.at[pos].set(last_pose, mode="drop"),
        grave_time=state.grave_time.at[pos].set(last_time, mode="drop"),
        grave_del=state.grave_del.at[pos].set(
            jnp.int32(frame_id), mode="drop"
        ),
        grave_ptr=(state.grave_ptr + jnp.sum(push).astype(jnp.int32)) % G,
    )


# --------------------------------------------------------------------------
# Phase 3: new-target initialization (IterativeTracker.py:52-113,
# hypothesis.py:9-77)
# --------------------------------------------------------------------------

def _hypothesis_costs(cfg, cams, hyp_pose, hyp_member, cam_c, dets_c, det_bel):
    """Cost / veto of adding camera-c detections to existing hypotheses.

    cost[h, d] = mean over members m of
        mean_j((d_a * s_member + d_b * s_det) / 2) / epi_threshold
    veto[h, d] = any member cost > 1 and believe(det) > 0.5
    (hypothesis.py:53-68).
    """
    J = cfg.num_joints
    Fm = cams.F[:, cam_c]  # (C, 3, 3): F[member_cam, det_cam]

    def hom(p):
        return jnp.concatenate([p[..., :2], jnp.ones(p.shape[:-1] + (1,))], -1)

    mem_h = hom(hyp_pose)   # (MH, C, J, 3)
    det_h = hom(dets_c)     # (D, J, 3)

    # Line in member view from det point: l = F x_det  ->  d_a.
    lines_a = jnp.einsum("mik,djk->mdji", Fm, det_h, precision="highest")  # (C, D, J, 3)
    na = jnp.sqrt(jnp.sum(lines_a[..., :2] ** 2, -1))
    na = jnp.where(na == 0, 1.0, na)
    d_a = jnp.abs(jnp.einsum("hmji,mdji->hmdj", mem_h, lines_a,
                             precision="highest")) / na[None]
    # Line in det view from member point: l = F^T x_member  ->  d_b.
    lines_b = jnp.einsum("mki,hmjk->hmji", Fm, mem_h, precision="highest")  # (MH, C, J, 3)
    nb = jnp.sqrt(jnp.sum(lines_b[..., :2] ** 2, -1))
    nb = jnp.where(nb == 0, 1.0, nb)
    d_b = jnp.abs(jnp.einsum("djk,hmjk->hmdj", det_h, lines_b,
                             precision="highest")) / nb[:, :, None, :]

    s_mem = hyp_pose[..., 2]  # (MH, C, J)
    s_det = dets_c[..., 2]    # (D, J)
    per_joint = (d_a * s_mem[:, :, None, :] + d_b * s_det[None, None]) / 2.0
    pc = jnp.mean(per_joint, axis=-1) / cfg.epi_threshold  # (MH, C, D)

    n_members = jnp.maximum(jnp.sum(hyp_member, axis=1), 1)
    cost = jnp.sum(jnp.where(hyp_member[:, :, None], pc, 0.0), axis=1) / n_members[:, None]
    veto = jnp.any(hyp_member[:, :, None] & (pc > 1.0), axis=1) & (det_bel > 0.5)[None, :]
    return cost, veto


def _init_targets(cfg: TrackerConfig, cams: CameraSet, state: TrackerState,
                  dets, unmatched, frame_id):
    C, J, MH, D = cfg.num_cameras, cfg.num_joints, cfg.max_hyp, cfg.max_dets
    scores = dets[..., 2]
    # believe = mean of non-negative keypoint scores (calculate.py:8-14 —
    # negative scores are excluded from the mean, not zeroed).
    nonneg = scores >= 0
    bel = jnp.sum(jnp.where(nonneg, scores, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(nonneg, axis=-1), 1
    )
    umask = unmatched & (bel > cfg.conf_threshold)

    hyp_pose = jnp.zeros((MH, C, J, 3), jnp.float32)
    hyp_member = jnp.zeros((MH, C), bool)
    hyp_count = jnp.int32(0)

    for c in range(C):
        dets_c, mask_c, bel_c = dets[c], umask[c], bel[c]

        def do_camera(carry, dets_c=dets_c, mask_c=mask_c, bel_c=bel_c, c=c):
            hyp_pose, hyp_member, hyp_count = carry
            hyp_valid = jnp.arange(MH) < hyp_count
            cost, veto = _hypothesis_costs(
                cfg, cams, hyp_pose, hyp_member, c, dets_c, bel_c
            )
            if cfg.tie_eps > 0.0:
                # Deterministic near-tie resolution, same scheme as
                # _associate but keyed on geometry only (hypotheses have
                # no persistent id): smooth position keys of the
                # hypothesis's member poses and of the detection. The
                # veto below still reads the unbiased costs.
                key = hyp_pose[..., 0] * 1e-3 + hyp_pose[..., 1] * 1.3e-3
                nm = jnp.maximum(jnp.sum(hyp_member, axis=1), 1)
                h_key = (
                    jnp.sum(jnp.where(hyp_member[:, :, None], key, 0.0),
                            axis=(1, 2)) / (nm * J)
                )  # (MH,)
                g_key = jnp.mean(
                    dets_c[:, :, 0] * 1e-3 + dets_c[:, :, 1] * 1.3e-3, axis=-1
                )  # (D,)
                cost_sel = cost + cfg.tie_eps * h_key[:, None] * g_key[None, :]
            else:
                cost_sel = cost
            col = masked_lap(cost_sel, hyp_valid, mask_c)  # (MH,) det idx or -1
            got_veto = jnp.take_along_axis(
                veto, jnp.clip(col, 0)[:, None], axis=1
            )[:, 0]
            merged = (col >= 0) & ~got_veto
            # Merge accepted detections into their hypotheses.
            mdet = jnp.take(dets_c, jnp.clip(col, 0), axis=0)  # (MH, J, 3)
            hyp_pose = hyp_pose.at[:, c].set(
                jnp.where(merged[:, None, None], mdet, hyp_pose[:, c])
            )
            hyp_member = hyp_member.at[:, c].set(merged | hyp_member[:, c])
            # Spawn order (reference: veto'd assignments in hypothesis order,
            # then unassigned detections in index order).
            veto_spawn = (col >= 0) & got_veto  # (MH,)
            assigned = jnp.zeros(D, bool).at[jnp.where(col >= 0, col, D)].set(
                True, mode="drop"
            )
            unassigned = mask_c & ~assigned  # (D,)
            n1 = jnp.cumsum(veto_spawn)
            pos1 = jnp.where(veto_spawn, hyp_count + n1 - 1, MH)  # MH -> drop
            n1_total = n1[-1] if MH > 0 else 0
            n2 = jnp.cumsum(unassigned)
            pos2 = jnp.where(unassigned, hyp_count + n1_total + n2 - 1, MH)
            spawn1 = jnp.take(dets_c, jnp.clip(col, 0), axis=0)  # (MH, J, 3)
            hyp_pose = hyp_pose.at[pos1, c].set(spawn1, mode="drop")
            hyp_member = hyp_member.at[pos1, c].set(True, mode="drop")
            hyp_pose = hyp_pose.at[pos2, c].set(dets_c, mode="drop")
            hyp_member = hyp_member.at[pos2, c].set(True, mode="drop")
            hyp_count = jnp.minimum(hyp_count + n1_total + n2[-1], MH)
            return (hyp_pose, hyp_member, hyp_count)

        # Steady-state fast path: a camera with no qualified unmatched
        # detections can neither merge nor spawn — skip its LAP + cost tensor
        # (the reference's loop body degenerates to a no-op there too).
        hyp_pose, hyp_member, hyp_count = jax.lax.cond(
            jnp.any(mask_c), do_camera, lambda carry: carry,
            (hyp_pose, hyp_member, hyp_count),
        )

    # Triangulate hypotheses with >= 2 members (hypothesis.py:23-44).
    # The whole build + slot allocation is skipped when no hypotheses exist
    # (steady state with every detection matched).
    def _build_and_allocate(state):
        return _materialize_hypotheses(
            cfg, cams, state, hyp_pose, hyp_member, hyp_count, frame_id
        )

    return jax.lax.cond(
        hyp_count > 0, _build_and_allocate, lambda s: s, state
    )


def _materialize_hypotheses(cfg, cams, state, hyp_pose, hyp_member, hyp_count,
                            frame_id):
    MH = cfg.max_hyp

    def build(member, poses):
        n_members = jnp.sum(member)
        D_t, _ = epipolar_distance_matrix(cams.F, poses, valid=member)
        aff = 1.0 - D_t / cfg.init_threshold
        keep = _greedy_init_keep(cfg, aff, member)
        n_views = jnp.sum(keep, axis=0).astype(jnp.int32)
        ok = (n_members >= 2) & jnp.all(n_views >= 2)
        weights = member.astype(jnp.float32)
        pose3d, _ = triangulate_joints(cams.P, poses[..., :2], weights, keep)
        return ok, pose3d, n_views

    hyp_valid = jnp.arange(MH) < hyp_count
    ok, pose3d, n_views = jax.vmap(build)(hyp_member, hyp_pose)
    ok = ok & hyp_valid

    if cfg.resurrect_window > 0:
        # Rescue: a hypothesis landing on a stale ACTIVE confirmed track's
        # motion-predicted pose re-seeds that track instead of spawning a
        # near-duplicate (the dominant id-churn pattern on long streams: the
        # track misses one re-association, the duplicate spawns, the original
        # ages out max_age frames later under a fresh id).
        rescued, rescue_slot, state = _rescue_stale_tracks(
            cfg, state, ok, pose3d, n_views, hyp_pose, hyp_member, frame_id
        )
        ok = ok & ~rescued

    # Allocate free track slots in hypothesis order.
    free = ~state.active
    free_rank = jnp.cumsum(free) - 1  # (T,)
    hyp_rank = jnp.cumsum(ok) - 1     # (MH,)
    T = cfg.max_tracks
    slot_of_hyp = jnp.sum(
        jnp.where(
            free[None, :] & (free_rank[None, :] == hyp_rank[:, None]) & ok[:, None],
            jnp.arange(T)[None, :],
            0,
        ),
        axis=1,
    )
    enough = hyp_rank < jnp.sum(free)
    alloc = ok & enough
    slot = jnp.where(alloc, slot_of_hyp, T)  # T -> dropped

    if cfg.resurrect_window > 0:
        res_id, grave_id = _match_graveyard(cfg, state, pose3d, alloc, frame_id)
        state = state._replace(grave_id=grave_id)
    else:
        res_id = jnp.full(MH, -1, jnp.int32)
    resur = res_id >= 0
    fresh = ok & ~resur
    fresh_rank = (jnp.cumsum(fresh) - 1).astype(jnp.int32)
    new_ids = jnp.where(resur, res_id, state.next_id + fresh_rank)
    st = state
    st = st._replace(
        active=st.active.at[slot].set(True, mode="drop"),
        # Resurrected hypotheses continue a confirmed identity: they re-enter
        # confirmed with n_init hits instead of re-serving the tentative
        # probation.
        confirmed=st.confirmed.at[slot].set(resur, mode="drop"),
        track_id=st.track_id.at[slot].set(new_ids, mode="drop"),
        hits=st.hits.at[slot].set(
            jnp.where(resur, cfg.n_init, 1), mode="drop"
        ),
        time_since_update=st.time_since_update.at[slot].set(0, mode="drop"),
        already_update=st.already_update.at[slot].set(False, mode="drop"),
        pose2d=st.pose2d.at[slot].set(hyp_pose, mode="drop"),
        pose2d_time=st.pose2d_time.at[slot].set(
            jnp.where(hyp_member, frame_id, NEVER), mode="drop"
        ),
        hist_pose=st.hist_pose.at[slot].set(0.0, mode="drop"),
        hist_time=st.hist_time.at[slot].set(NEVER, mode="drop"),
        hist_count=st.hist_count.at[slot].set(1, mode="drop"),
        last_n_views=st.last_n_views.at[slot].set(n_views, mode="drop"),
        velocity=st.velocity.at[slot].set(0.0, mode="drop"),
    )
    st = st._replace(
        hist_pose=st.hist_pose.at[slot, 0].set(pose3d, mode="drop"),
        hist_time=st.hist_time.at[slot, 0].set(frame_id, mode="drop"),
        next_id=st.next_id + jnp.sum(fresh).astype(jnp.int32),
    )
    return st


def _rescue_stale_tracks(cfg, state, ok, pose3d, n_views, hyp_pose,
                         hyp_member, frame_id):
    """Greedy hypothesis -> active-confirmed-track matching (resurrection).

    An active confirmed track whose last pose lies within the motion-budget
    gate of an ok hypothesis claims it instead of letting a near-duplicate id
    spawn. Two regimes (the dominant churn pattern on long streams is a
    duplicate forming while the original is STILL matched in some cameras —
    measured in tests/test_resurrect.py):

      * stale track (missed this frame's association, tsu >= 1): full
        re-seed — identity (id, confirmed, hits) continues, kinematics
        restart exactly like a track birth (history = [triangulated
        hypothesis pose], zero velocity, member cameras' 2D poses stamped at
        `frame_id`).
      * fresh track (tsu == 0, updated this frame): soft absorb — only the
        hypothesis member cameras' 2D poses are merged into the track's 2D
        store (those are exactly the cameras whose association broke), so
        the next update pulls the drifted 3D pose back; history, velocity
        and hits are untouched.

    Returns (rescued (MH,) bool, rescue_slot (MH,), new state).
    """
    T, MH = cfg.max_tracks, cfg.max_hyp
    last_pose, last_time = _last_hist(state)
    eligible = state.active & state.confirmed
    dist = jnp.mean(
        jnp.linalg.norm(pose3d[:, None] - last_pose[None], axis=-1), axis=-1
    )  # (MH, T)
    gate = cfg.resurrect_dist + cfg.resurrect_speed * (
        frame_id - last_time
    ).astype(jnp.float32)  # (T,)
    dist = jnp.where(
        ok[:, None] & eligible[None, :] & (dist < gate[None, :]), dist, jnp.inf
    )
    rescued = jnp.zeros(MH, bool)
    rescue_slot = jnp.zeros(MH, jnp.int32)
    for h in range(MH):  # static loop; only compiled when resurrection is on
        t = jnp.argmin(dist[h])
        hit = jnp.isfinite(dist[h, t])
        rescued = rescued.at[h].set(hit)
        rescue_slot = rescue_slot.at[h].set(t.astype(jnp.int32))
        dist = jnp.where(hit, dist.at[:, t].set(jnp.inf), dist)

    stale_of_slot = jnp.take(state.time_since_update, rescue_slot) >= 1
    rslot = jnp.where(rescued, rescue_slot, T)  # T -> dropped
    # Kinematic re-seed only for stale tracks; fresh absorbs keep their state.
    kslot = jnp.where(rescued & stale_of_slot, rescue_slot, T)
    safe = jnp.clip(rescue_slot, 0, T - 1)
    old2d = jnp.take(state.pose2d, safe, axis=0)        # (MH, C, J, 3)
    old2dt = jnp.take(state.pose2d_time, safe, axis=0)  # (MH, C)
    new2d = jnp.where(hyp_member[:, :, None, None], hyp_pose, old2d)
    new2dt = jnp.where(hyp_member, jnp.int32(frame_id), old2dt)
    old_hits = jnp.take(state.hits, safe)
    st = state._replace(
        pose2d=state.pose2d.at[rslot].set(new2d, mode="drop"),
        pose2d_time=state.pose2d_time.at[rslot].set(new2dt, mode="drop"),
        hits=state.hits.at[kslot].set(old_hits + 1, mode="drop"),
        time_since_update=state.time_since_update.at[kslot].set(
            0, mode="drop"
        ),
        already_update=state.already_update.at[kslot].set(True, mode="drop"),
        hist_pose=state.hist_pose.at[kslot].set(0.0, mode="drop"),
        hist_time=state.hist_time.at[kslot].set(NEVER, mode="drop"),
        hist_count=state.hist_count.at[kslot].set(1, mode="drop"),
        last_n_views=state.last_n_views.at[kslot].set(n_views, mode="drop"),
        velocity=state.velocity.at[kslot].set(0.0, mode="drop"),
    )
    st = st._replace(
        hist_pose=st.hist_pose.at[kslot, 0].set(pose3d, mode="drop"),
        hist_time=st.hist_time.at[kslot, 0].set(frame_id, mode="drop"),
    )
    return rescued, rescue_slot, st


def _match_graveyard(cfg, state, pose3d, alloc, frame_id):
    """Greedy hypothesis -> recently-deleted-track matching (resurrection).

    For each allocatable hypothesis in order, the nearest unexpired graveyard
    entry (mean joint distance between the hypothesis pose and the entry's
    last pose) inside its motion-budget gate — resurrect_dist +
    resurrect_speed * frames since the entry's last update — is claimed;
    claimed entries are consumed. Returns (res_id (MH,) int32 with -1 for no
    match, updated grave_id with consumed entries cleared)."""
    G = cfg.max_tracks
    MH = cfg.max_hyp
    dist = jnp.mean(
        jnp.linalg.norm(pose3d[:, None] - state.grave_pose[None], axis=-1),
        axis=-1,
    )  # (MH, G)
    gate = cfg.resurrect_dist + cfg.resurrect_speed * (
        frame_id - state.grave_time
    ).astype(jnp.float32)  # (G,)
    g_valid = (state.grave_id >= 0) & (
        frame_id - state.grave_del <= cfg.resurrect_window
    )
    dist = jnp.where(
        alloc[:, None] & g_valid[None, :] & (dist < gate[None, :]),
        dist, jnp.inf,
    )
    res_id = jnp.full(MH, -1, jnp.int32)
    consumed = jnp.zeros(G, bool)
    for h in range(MH):  # static loop; only compiled when resurrection is on
        g = jnp.argmin(dist[h])
        hit = jnp.isfinite(dist[h, g])
        res_id = res_id.at[h].set(jnp.where(hit, state.grave_id[g], -1))
        consumed = consumed.at[g].set(consumed[g] | hit)
        dist = jnp.where(hit, dist.at[:, g].set(jnp.inf), dist)
    return res_id, jnp.where(consumed, -1, state.grave_id)


# --------------------------------------------------------------------------
# Frame step
# --------------------------------------------------------------------------

def tracker_step(cfg: TrackerConfig, cams: CameraSet, state: TrackerState,
                 dets, det_mask, frame_id):
    """One tracking frame; fully jittable (cfg static).

    Args:
      cams: CameraSet with C == cfg.num_cameras.
      state: TrackerState.
      dets: (C, D, J, 3) detections, (x, y, score).
      det_mask: (C, D) bool validity.
      frame_id: int32 scalar.

    Returns:
      (new_state, FrameOutput)
    """
    dets = jnp.asarray(dets, jnp.float32)
    # add_age (IterativeTracker.py:126-129)
    state = state._replace(
        already_update=jnp.zeros_like(state.already_update),
        time_since_update=jnp.where(
            state.active, state.time_since_update + 1, state.time_since_update
        ),
    )
    matched, match_col, unmatched = _associate(
        cfg, cams, state, dets, det_mask, frame_id
    )
    state = _apply_matches(state, dets, matched, match_col, frame_id)
    state = _update_tracks(cfg, cams, state, frame_id)
    state = _init_targets(cfg, cams, state, dets, unmatched, frame_id)

    pose3d, _ = _last_hist(state)
    out = FrameOutput(
        valid=state.active & state.confirmed & (state.time_since_update == 0),
        track_id=state.track_id,
        pose3d=pose3d,
        n_views=state.last_n_views,
        pose2d=state.pose2d,
        pose2d_now=state.pose2d_time == frame_id,
    )
    return state, out


def make_step_fn(cfg: TrackerConfig):
    """jit-compiled step closure over a static config."""
    def step(cams, state, dets, det_mask, frame_id):
        return tracker_step(cfg, cams, state, dets, det_mask, frame_id)

    return jax.jit(step)


def track_clip(cfg: TrackerConfig, cams: CameraSet, state: TrackerState,
               dets, det_mask, frame_ids):
    """lax.scan over a buffered clip of frames.

    Args:
      dets: (F, C, D, J, 3); det_mask: (F, C, D); frame_ids: (F,).
    Returns:
      (final_state, FrameOutput stacked over F).
    """
    def body(carry, xs):
        d, m, f = xs
        new_state, out = tracker_step(cfg, cams, carry, d, m, f)
        return new_state, out

    return jax.lax.scan(body, state, (dets, det_mask, frame_ids))
