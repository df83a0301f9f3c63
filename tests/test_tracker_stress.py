"""Tracker stress tests: crowded scenes, capacity saturation, restart."""
import numpy as np
import jax.numpy as jnp

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras
from tpupose.tracking.tracker import TrackerConfig, init_state, make_step_fn
from tpupose.utils.validate import assert_tracker_invariants


def _run_pair(scene, cfg_kw=None, frames=None):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, TrackerParams())
    cfg = TrackerConfig(num_cameras=scene.num_cameras, **(cfg_kw or {}))
    step = make_step_fn(cfg)
    state = init_state(cfg)
    for t in range(frames or scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((scene.num_cameras, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        assert_tracker_invariants(state, cfg)
    return oracle, state


def test_crowded_scene_parity():
    # 5 actors, 5 cameras — stresses hypothesis building and greedy filters.
    scene = make_scene(num_frames=20, num_cameras=5, num_actors=5,
                       noise_px=1.0, seed=31)
    oracle, state = _run_pair(scene, cfg_kw=dict(max_dets=8, max_tracks=12,
                                                 max_hyp=40))
    ref_ids = {t.track_id for t in oracle.tracks}
    got_ids = set(np.asarray(state.track_id)[np.asarray(state.active)].tolist())
    assert ref_ids == got_ids
    assert len(ref_ids) == 5


def test_capacity_saturation_is_graceful():
    # More actors than track slots: the tracker must stay valid (capacity
    # overflow drops new hypotheses — a documented deviation from the
    # reference's unbounded lists).
    scene = make_scene(num_frames=12, num_cameras=5, num_actors=6,
                       noise_px=1.0, seed=32)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=4, max_hyp=12)
    step = make_step_fn(cfg)
    state = init_state(cfg)
    for t in range(scene.num_frames):
        dets = np.zeros((5, 8, 17, 3), np.float32)
        mask = np.zeros((5, 8), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        assert_tracker_invariants(state, cfg)
    assert int(np.asarray(state.active).sum()) == 4  # full, not corrupted


def test_track_restart():
    scene = make_scene(num_frames=8, num_cameras=4, num_actors=2, seed=33)
    from tpupose.pipeline.facade import Pipeline

    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=4)
    pipe = Pipeline(cams=rig, tracker_cfg=cfg)
    for t in range(8):
        dets = np.zeros((4, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((4, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        pipe.person_track(t, jnp.asarray(dets), jnp.asarray(mask))
    assert int(np.asarray(pipe.state.active).sum()) > 0
    pipe.track_restart()
    assert int(np.asarray(pipe.state.active).sum()) == 0
    assert int(np.asarray(pipe.state.next_id)) == 0
