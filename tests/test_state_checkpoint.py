"""Checkpoint/resume of tracker state mid-stream (SURVEY §5: the TPU build
adds checkpoint-restart for long streaming runs; the reference has none)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.models.checkpoint import restore_params, save_params
from tpupose.tracking.tracker import TrackerConfig, TrackerState, init_state, make_step_fn


def test_tracker_state_checkpoint_resume(tmp_path):
    scene = make_scene(num_frames=20, num_cameras=4, num_actors=2,
                       noise_px=1.0, seed=41)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=4, max_dets=6, max_tracks=8, max_hyp=16)
    step = make_step_fn(cfg)

    def dets_at(t):
        dets = np.zeros((4, 6, 17, 3), np.float32)
        mask = np.zeros((4, 6), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        return jnp.asarray(dets), jnp.asarray(mask)

    # Run 10 frames, checkpoint, run 10 more.
    state = init_state(cfg)
    for t in range(10):
        d, m = dets_at(t)
        state, _ = step(rig, state, d, m, t)
    path = str(tmp_path / "tracker_state")
    save_params(path, state._asdict())
    for t in range(10, 20):
        d, m = dets_at(t)
        state, _ = step(rig, state, d, m, t)

    # Restore at frame 10 and replay the same tail.
    like = init_state(cfg)._asdict()
    restored = TrackerState(**restore_params(path, like=like))
    for t in range(10, 20):
        d, m = dets_at(t)
        restored, _ = step(rig, restored, d, m, t)

    np.testing.assert_array_equal(
        np.asarray(state.track_id), np.asarray(restored.track_id)
    )
    np.testing.assert_allclose(
        np.asarray(state.hist_pose), np.asarray(restored.hist_pose), atol=1e-6
    )
