"""Track resurrection: reuse a recently-deleted confirmed track's id when a
new hypothesis spawns at its motion-predicted pose.

New capability with no reference counterpart: the reference mints a fresh id
whenever a person re-emerges after max_age frames of occlusion
(`src/tracking/IterativeTracker.py:108-113` — init_target_GD assigns
max(track_id)+1 unconditionally), which is what drives the id churn measured
in the 1,000-frame soak (tests/test_tracker_soak.py). Default OFF
(`resurrect_window=0`) so every reference-parity test is untouched; the jit
and oracle implementations are pinned against each other here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.data.synthetic import (
    make_continuous_adversarial_scene,
    make_scene,
)
from tpupose.eval.mot import evaluate_mot
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras
from tpupose.tracking.tracker import (
    TrackerConfig,
    init_state,
    make_step_fn,
    track_clip,
)


def _pack(scene, cfg):
    F = scene.num_frames
    dets = np.zeros((F, scene.num_cameras, cfg.max_dets, 17, 3), np.float32)
    mask = np.zeros((F, scene.num_cameras, cfg.max_dets), bool)
    for t in range(F):
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[t, c, :n] = d[:n]
            mask[t, c, :n] = True
    return jnp.asarray(dets), jnp.asarray(mask)


def _occluded_scene():
    """Two walkers; actor 1 fully occluded (all cameras) for 15 frames —
    longer than max_age=10, so its track is deleted mid-stream."""
    scene = make_scene(num_frames=40, num_actors=2, noise_px=0.5, seed=3)
    scene.visible[8:23, :, 1] = False
    return scene


def _run_clip(scene, cfg):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    dets, mask = _pack(scene, cfg)
    fids = jnp.arange(scene.num_frames, dtype=jnp.int32)
    clip = jax.jit(lambda st, d, m, f: track_clip(cfg, rig, st, d, m, f))
    state, outs = clip(init_state(cfg), dets, mask, fids)
    return state, outs


def _ids_of_actor(scene, outs, actor, dist=0.4):
    """Track ids whose output pose sits on the given GT actor, per frame."""
    valid = np.asarray(outs.valid)
    tids = np.asarray(outs.track_id)
    poses = np.asarray(outs.pose3d)
    seen = []
    for t in range(valid.shape[0]):
        for s in np.flatnonzero(valid[t]):
            d = np.linalg.norm(
                poses[t, s] - scene.gt3d[t, actor], axis=-1
            ).mean()
            if d < dist:
                seen.append((t, int(tids[t, s])))
    return seen


def test_resurrection_reuses_id_after_long_occlusion():
    scene = _occluded_scene()
    base = dict(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24)

    # Reference parity (off): the re-emerged actor gets a NEW id.
    _, outs_off = _run_clip(scene, TrackerConfig(**base))
    seen_off = _ids_of_actor(scene, outs_off, actor=1)
    ids_before = {i for t, i in seen_off if t < 8}
    ids_after = {i for t, i in seen_off if t >= 23}
    assert ids_before and ids_after
    assert ids_before.isdisjoint(ids_after), (seen_off,)

    # Resurrection on: the SAME id carries across the occlusion, and it is
    # confirmed (visible in outputs) from the resurrection frame onward.
    # Default gate: 0.3 m + 0.06 m/frame x 16 frames since last update
    # = 1.26 m >> the ~0.6 m the walker covers while occluded.
    cfg = TrackerConfig(**base, resurrect_window=20)
    state, outs_on = _run_clip(scene, cfg)
    seen_on = _ids_of_actor(scene, outs_on, actor=1)
    ids_before = {i for t, i in seen_on if t < 8}
    ids_after = {i for t, i in seen_on if t >= 23}
    assert ids_before == ids_after, (seen_on,)
    # Only the two real identities were ever minted.
    assert int(np.asarray(state.next_id)) == 2
    # The consumed graveyard entry is gone; no double resurrection possible.
    assert int((np.asarray(state.grave_id) >= 0).sum()) == 0
    # Resurrection frame: output valid the same frame the hypothesis spawned
    # (no second tentative probation).
    first_after = min(t for t, _ in seen_on if t >= 23)
    assert first_after <= 24, seen_on


def test_resurrection_off_leaves_graveyard_empty():
    scene = _occluded_scene()
    state, _ = _run_clip(
        scene, TrackerConfig(num_cameras=5, max_dets=8, max_tracks=12,
                             max_hyp=24)
    )
    assert (np.asarray(state.grave_id) == -1).all()
    assert int(np.asarray(state.grave_ptr)) == 0
    # The deletion DID happen (a third id was minted on re-emergence).
    assert int(np.asarray(state.next_id)) == 3


def test_resurrection_oracle_parity():
    """Exact jit-vs-oracle step parity through delete + resurrect."""
    scene = _occluded_scene()
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(
        num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24,
        resurrect_window=20,
    )
    oracle = OracleTracker(
        _Cameras(np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
                 np.asarray(rig.center)),
        TrackerParams(resurrect_window=20),
    )
    step = make_step_fn(cfg)
    state = init_state(cfg)
    resurrected = False
    for t in range(scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((5, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((5, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        state, _ = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        got = {
            int(i): (int(h), int(u))
            for i, h, u, a in zip(
                np.asarray(state.track_id), np.asarray(state.hits),
                np.asarray(state.time_since_update), np.asarray(state.active),
            )
            if a
        }
        ref = {tr.track_id: (tr.hits, tr.time_since_update)
               for tr in oracle.tracks}
        assert got == ref, f"frame {t}: {got} vs {ref}"
        if t >= 23 and len(oracle.graveyard) == 0 and oracle.next_id == 2:
            resurrected = True
    assert resurrected  # the scenario actually exercised the feature
    assert oracle.next_id == int(np.asarray(state.next_id)) == 2


def test_rescue_reclaims_stale_track_without_new_id():
    """The RESCUE path: a position jump breaks 2D association (reprojection
    error beyond alpha2d) while the track is still alive; the re-detected
    person forms a hypothesis that re-seeds the stale track instead of
    spawning a duplicate id. alpha2d=15 px makes the 2D gate (~0.15 m at
    this rig's ~7 m range) tighter than the 3D rescue gate (0.36 m at one
    frame of staleness), so a 0.3 m jump lands between the two."""
    from tpupose.data.synthetic import _project

    scene = make_scene(num_frames=30, num_actors=1, noise_px=0.5, seed=5)
    scene.gt3d[15:, 0, :, 0] += 0.30
    for c in range(scene.num_cameras):
        scene.gt2d[:, c] = _project(scene.P[c].astype(np.float64), scene.gt3d)
    rng = np.random.default_rng(11)
    scene.detections[..., :2] = (
        scene.gt2d + rng.normal(scale=0.5, size=scene.gt2d.shape)
    ).astype(np.float32)

    base = dict(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24,
                alpha2d=15.0)

    state_off, _ = _run_clip(scene, TrackerConfig(**base))
    assert int(np.asarray(state_off.next_id)) >= 2  # duplicate was spawned

    cfg = TrackerConfig(**base, resurrect_window=10)
    state_on, outs_on = _run_clip(scene, cfg)
    assert int(np.asarray(state_on.next_id)) == 1  # rescued, no duplicate
    seen = _ids_of_actor(scene, outs_on, actor=0)
    assert {i for _, i in seen} == {0}
    # the track kept producing output right through the jump frame
    frames_out = {t for t, _ in seen}
    assert frames_out.issuperset(range(16, 30)), sorted(frames_out)

    # oracle parity through the rescue event
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    oracle = OracleTracker(
        _Cameras(np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
                 np.asarray(rig.center)),
        TrackerParams(alpha2d=15.0, resurrect_window=10),
    )
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
        got = {
            int(i): (int(h), int(u))
            for i, h, u, a in zip(
                np.asarray(state.track_id), np.asarray(state.hits),
                np.asarray(state.time_since_update), np.asarray(state.active),
            )
            if a
        }
        ref = {tr.track_id: (tr.hits, tr.time_since_update)
               for tr in oracle.tracks}
        assert got == ref, f"frame {t}: {got} vs {ref}"
    assert oracle.next_id == 1


def test_resurrect_yaml_keys_reach_tracker_config(tmp_path):
    import yaml

    from tpupose.data.config import load_config, tracker_config_from

    raw = {
        "TEST_FUNCTION": "PersonTrack_Project3DPose",
        "PIPELINE_COMBINATION": {"PERSON_MATCHER": "Iterative"},
        "DATASET": {
            "TEST_DATASET": "CampusSeq1",
            "ROOT": str(tmp_path),
            "FOLDERS_ORDER": ["Camera0", "Camera1", "Camera2"],
        },
        "PERSON_MATCHERS": {
            "ITERATIVE": {"RESURRECT_WINDOW": 25, "RESURRECT_DIST": 0.75},
        },
    }
    path = tmp_path / "model_configs.yaml"
    path.write_text(yaml.safe_dump(raw))
    cfg = load_config(str(path))
    tcfg = tracker_config_from(cfg, num_cameras=5)
    assert tcfg.resurrect_window == 25
    assert tcfg.resurrect_dist == 0.75
    # absent keys -> off (reference parity)
    raw["PERSON_MATCHERS"]["ITERATIVE"] = {}
    path.write_text(yaml.safe_dump(raw))
    tcfg = tracker_config_from(load_config(str(path)), num_cameras=5)
    assert tcfg.resurrect_window == 0


def test_graveyard_ring_overflow_parity():
    """The jit graveyard is a fixed ring of max_tracks entries (burial #n
    evicts burial #(n - max_tracks), consumed or not); the oracle mirrors
    that cap. Overflow the ring with more confirmed deletions than capacity
    inside one (huge) resurrect window and assert the surviving entry ids
    match at every frame. resurrect_dist is microscopic so nothing is ever
    rescued or revived — every re-appearance mints, every deletion buries."""
    CYCLE, N_CYCLES = 17, 7
    F = CYCLE * N_CYCLES
    scene = make_scene(num_frames=F, num_actors=1, noise_px=0.5, seed=9)
    for k in range(N_CYCLES):
        # visible 5 frames (confirm at 3 hits), occluded 12 (> max_age=10)
        scene.visible[k * CYCLE + 5:(k + 1) * CYCLE, :, 0] = False
        # teleport each re-appearance far away so nothing could ever match
        scene.gt3d[k * CYCLE:(k + 1) * CYCLE, 0, :, 0] += 2.0 * (k % 2)
    from tpupose.data.synthetic import _project
    for c in range(scene.num_cameras):
        scene.gt2d[:, c] = _project(scene.P[c].astype(np.float64), scene.gt3d)
    rng = np.random.default_rng(13)
    scene.detections[..., :2] = (
        scene.gt2d + rng.normal(scale=0.5, size=scene.gt2d.shape)
    ).astype(np.float32)

    G = 4
    cfg = TrackerConfig(
        num_cameras=5, max_dets=8, max_tracks=G, max_hyp=24,
        resurrect_window=10_000, resurrect_dist=1e-4, resurrect_speed=0.0,
    )
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    oracle = OracleTracker(
        _Cameras(np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
                 np.asarray(rig.center)),
        TrackerParams(resurrect_window=10_000, resurrect_dist=1e-4,
                      resurrect_speed=0.0, max_tracks=G),
    )
    step = make_step_fn(cfg)
    state = init_state(cfg)
    overflowed = False
    for t in range(F):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((5, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((5, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        state, _ = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        jit_ids = sorted(
            int(i) for i in np.asarray(state.grave_id) if i >= 0
        )
        ora_ids = sorted(g["id"] for g in oracle.graveyard)
        assert jit_ids == ora_ids, f"frame {t}: {jit_ids} vs {ora_ids}"
        if oracle._burials > G:
            overflowed = True
    assert overflowed  # the scenario actually wrapped the ring
    assert len(ora_ids) == G  # capacity held, oldest evicted


def test_n_init_1_tentative_deletion_not_buried():
    """Burial condition is `deleted & confirmed` in both implementations:
    with n_init=1 a just-born track (hits=1) is still TENTATIVE until its
    first successful update, so a one-frame detection blip must NOT reach
    the graveyard (the old hits >= n_init proxy would have buried it)."""
    scene = make_scene(num_frames=10, num_actors=1, noise_px=0.5, seed=4)
    scene.visible[1:, :, 0] = False  # actor exists for exactly one frame
    cfg = TrackerConfig(
        num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24,
        n_init=1, resurrect_window=20,
    )
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    oracle = OracleTracker(
        _Cameras(np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
                 np.asarray(rig.center)),
        TrackerParams(n_init=1, resurrect_window=20, max_tracks=12),
    )
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
    # The track was born...
    assert int(np.asarray(state.next_id)) == oracle.next_id == 1
    # ...and deleted tentative: no burial on either side.
    assert (np.asarray(state.grave_id) == -1).all()
    assert oracle.graveyard == []
    assert not np.asarray(state.active).any()
    assert len(oracle.tracks) == 0


def test_resurrection_reduces_id_churn_and_keeps_idf1():
    """On the soak stream's continuous adversarial scene, resurrection cuts
    minted ids and does not hurt (typically improves) identity quality."""
    scene = make_continuous_adversarial_scene(
        num_frames=400, num_cameras=5, num_actors=3, noise_px=1.0,
        occlusion_px=60.0, shuffle=True, seed=7,
    )
    base = dict(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24)
    state_off, outs_off = _run_clip(scene, TrackerConfig(**base))
    state_on, outs_on = _run_clip(
        scene, TrackerConfig(**base, resurrect_window=25)
    )
    ids_off = int(np.asarray(state_off.next_id))
    ids_on = int(np.asarray(state_on.next_id))
    assert ids_on < ids_off, (ids_on, ids_off)

    def mot(outs):
        gt = [
            {a: scene.gt3d[t, a] for a in range(scene.num_actors)}
            for t in range(scene.num_frames)
        ]
        valid = np.asarray(outs.valid)
        tids = np.asarray(outs.track_id)
        poses = np.asarray(outs.pose3d)
        pred = [
            {int(tids[t, s]): poses[t, s] for s in np.flatnonzero(valid[t])}
            for t in range(scene.num_frames)
        ]
        return evaluate_mot(gt, pred)

    m_off, m_on = mot(outs_off), mot(outs_on)
    assert m_on["idf1"] >= m_off["idf1"] - 0.01, (m_on, m_off)
    assert m_on["id_switches"] <= m_off["id_switches"], (m_on, m_off)
