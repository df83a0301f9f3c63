"""End-to-end: jitted tracker outputs scored with MOT metrics on synthetic
scenes — identity quality must be near-perfect at moderate noise."""
import numpy as np
import jax.numpy as jnp

from tpupose.data.synthetic import make_scene
from tpupose.eval.mot import evaluate_mot
from tpupose.geometry import make_camera_set
from tpupose.tracking.tracker import TrackerConfig, init_state, make_step_fn


def test_tracker_mot_idf1():
    scene = make_scene(num_frames=40, num_cameras=5, num_actors=3,
                       noise_px=1.5, drop_prob=0.15, seed=21)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=10, max_hyp=20)
    step = make_step_fn(cfg)
    state = init_state(cfg)

    gt_frames, pred_frames = [], []
    for t in range(scene.num_frames):
        dets = np.zeros((5, 8, 17, 3), np.float32)
        mask = np.zeros((5, 8), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        valid = np.asarray(out.valid)
        ids = np.asarray(out.track_id)[valid]
        poses = np.asarray(out.pose3d)[valid]
        pred_frames.append({int(i): p for i, p in zip(ids, poses)})
        gt_frames.append({a: scene.gt3d[t, a] for a in range(3)})

    # Skip the confirmation warm-up (first n_init frames output nothing).
    m = evaluate_mot(gt_frames[4:], pred_frames[4:], dist_threshold=0.3)
    assert m["idf1"] > 0.95, m
    assert m["mota"] > 0.9, m
    assert m["id_switches"] == 0, m
