"""Long-stream soak: 1,000 frames of CONTINUOUS adversarial motion through
the scanned tracker (VERDICT r2 item 8).

A deployment tracks hours of video; the state machine must not leak track
slots, mint unbounded ids, or corrupt history under sustained churn
(recurring occlusions, crossings, detection-order shuffling). The stream is
`make_continuous_adversarial_scene` — smooth Lissajous orbits that
repeatedly cross the scene center, with view-dependent occlusion — NOT a
looped short clip (looping teleports actors at every wrap, a churn profile
no deployment sees).

Oracle comparison at this horizon is STRUCTURAL, not exact: after an
occlusion the tracker extrapolates constant-velocity for up to max_age
frames, and whether the re-association lands is a near-tie that f32 (jit)
and f64 (oracle) resolve differently after enough drift (measured: first
flip at frame ~29 of this stream — one missed re-association, then the
aged-out delete the reference would also do one tie away). Exact
step-parity is pinned separately on shorter horizons
(tests/test_tracker_parity.py, incl. a continuous-scene case); here the
bands assert the jitted tracker keeps the same POPULATION behavior as the
reference algorithm over 10x the lifetime, plus a direct quality signal
against ground truth.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.data.synthetic import make_continuous_adversarial_scene
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras
from tpupose.tracking.tracker import (
    TrackerConfig,
    init_state,
    track_clip,
)

FRAMES = 1000
CHUNK = 100


def test_soak_1000_frames_continuous_stream():
    scene = make_continuous_adversarial_scene(
        num_frames=FRAMES, num_cameras=5, num_actors=3, noise_px=1.0,
        occlusion_px=60.0, shuffle=True, seed=7,
    )
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, TrackerParams())

    dets = np.zeros((FRAMES, 5, cfg.max_dets, 17, 3), np.float32)
    mask = np.zeros((FRAMES, 5, cfg.max_dets), bool)
    for t in range(FRAMES):
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[t, c, :n] = d[:n]
            mask[t, c, :n] = True

    clip_fn = jax.jit(lambda st, d, m, f: track_clip(cfg, rig, st, d, m, f))
    state = init_state(cfg)
    max_active_seen = 0
    actors_tracked = []  # per checkpoint: how many GT actors a track covers
    for start in range(0, FRAMES, CHUNK):
        end = start + CHUNK
        state, outs = clip_fn(
            state,
            jnp.asarray(dets[start:end]),
            jnp.asarray(mask[start:end]),
            jnp.arange(start, end, dtype=jnp.int32),
        )
        for t in range(start, end):
            oracle.step(t, scene.detections_list(t))

        # -- invariants at the chunk boundary --------------------------------
        active = np.asarray(state.active)
        counts = np.asarray(state.hist_count)
        hist = np.asarray(state.hist_pose)
        next_id = int(np.asarray(state.next_id))
        n_active = int(active.sum())
        max_active_seen = max(max_active_seen, n_active)

        # 1. No slot leak: live slots stay within the actor population
        #    (+ transient tentatives), matching the oracle within the
        #    near-tie band, never saturating capacity.
        assert n_active < cfg.max_tracks, f"frame {end}: slots saturated"
        assert abs(n_active - len(oracle.tracks)) <= 2, (
            f"frame {end}: {n_active} live slots vs {len(oracle.tracks)} "
            "oracle tracks"
        )
        # 2. id minting matches the f64 oracle. Rounds 2-4 ran with a band
        #    of 8 (measured per-checkpoint jit-minus-oracle diffs
        #    1,1,3,5,5,6,8,8,8,8); round 5 found the cause — stale-view
        #    time weights vanishing below f32 rounding in the
        #    triangulation normal matrix, producing 10-30 m poses that
        #    killed re-association (TIME_WEIGHT_REL_FLOOR,
        #    geometry/triangulation.py) — after which jit and oracle mint
        #    IDENTICAL id counts at every checkpoint of this stream
        #    (scripts/tie_churn_sweep.py). Band 2 = headroom for residual
        #    f32 near-ties, not an observed diff.
        assert abs(next_id - oracle.next_id) <= 2, (
            f"frame {end}: next_id {next_id} vs oracle {oracle.next_id}"
        )
        # 3. History pruning stable: counts within capacity, poses finite.
        assert (counts[active] >= 1).all() and (counts <= cfg.hist_len).all()
        assert np.isfinite(hist[active]).all(), f"frame {end}: non-finite hist"

        # 4. Quality: confirmed tracks actually cover the GT actors.
        conf = np.asarray(state.confirmed) & active
        last = hist[np.arange(len(counts)), np.maximum(counts - 1, 0)]
        covered = 0
        for a in range(scene.num_actors):
            gt = scene.gt3d[end - 1, a]
            if conf.any():
                d3 = np.linalg.norm(
                    last[conf] - gt[None], axis=-1
                ).mean(axis=-1)
                covered += bool((d3 < 0.5).any())
        actors_tracked.append(covered)

    assert 3 <= max_active_seen < cfg.max_tracks, max_active_seen
    # id churn stays far below one per frame over the whole stream
    assert int(np.asarray(state.next_id)) < FRAMES // 10, (
        f"id churn too high: {int(np.asarray(state.next_id))} ids"
    )
    # all 3 actors tracked at >= 80% of checkpoints, never fewer than 2
    actors_tracked = np.asarray(actors_tracked)
    assert (actors_tracked >= 2).all(), actors_tracked
    assert (actors_tracked == 3).mean() >= 0.8, actors_tracked


def test_continuous_scene_short_horizon_oracle_parity():
    """Exact step parity on the continuous-adversarial stream over a
    pre-divergence horizon (the first near-tie flip on this stream is at
    frame ~29; 20 frames is safely inside while still covering births,
    confirmations and occlusion aging)."""
    from tpupose.tracking.tracker import make_step_fn

    scene = make_continuous_adversarial_scene(
        num_frames=20, num_cameras=5, num_actors=3, noise_px=1.0,
        occlusion_px=60.0, shuffle=True, seed=7,
    )
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, TrackerParams())
    step = make_step_fn(cfg)
    state = init_state(cfg)
    for t in range(scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((5, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((5, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        state, _ = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        active = np.asarray(state.active)
        got = {
            int(i): (int(h), int(u))
            for i, h, u, a in zip(
                np.asarray(state.track_id), np.asarray(state.hits),
                np.asarray(state.time_since_update), active,
            )
            if a
        }
        ref = {
            tr.track_id: (tr.hits, tr.time_since_update)
            for tr in oracle.tracks
        }
        assert got == ref, f"frame {t}: {got} vs {ref}"
