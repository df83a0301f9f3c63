"""Oracle tracker end-to-end on synthetic scenes: recovers GT 3D poses with
persistent IDs (SURVEY.md §4 test strategy)."""
import numpy as np

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras


def _make_tracker(scene, **kw):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cams = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv), np.asarray(rig.center)
    )
    params = TrackerParams(**kw)
    return OracleTracker(cams, params)


def _run(scene, tracker):
    per_frame = []
    for t in range(scene.num_frames):
        tracker.step(t, scene.detections_list(t))
        per_frame.append(tracker.outputs(t))
    return per_frame


def _match_error(outs, gt3d_t):
    """Mean joint error of each GT actor's nearest output pose."""
    errs = []
    for a in range(gt3d_t.shape[0]):
        if not outs:
            errs.append(np.inf)
            continue
        d = [np.linalg.norm(o["pose3d"] - gt3d_t[a], axis=-1).mean() for o in outs]
        errs.append(min(d))
    return errs


def test_oracle_tracks_clean_scene():
    scene = make_scene(num_frames=30, num_cameras=4, num_actors=2, noise_px=0.5, seed=1)
    tracker = _make_tracker(scene)
    per_frame = _run(scene, tracker)
    # After confirmation (n_init=3), every frame should output 2 tracks.
    for t in range(5, scene.num_frames):
        assert len(per_frame[t]) == 2, f"frame {t}: {len(per_frame[t])} tracks"
        errs = _match_error(per_frame[t], scene.gt3d[t])
        assert max(errs) < 0.05, f"frame {t}: errors {errs}"


def test_oracle_ids_are_persistent():
    scene = make_scene(num_frames=40, num_cameras=5, num_actors=3, noise_px=1.0, seed=2)
    tracker = _make_tracker(scene)
    per_frame = _run(scene, tracker)
    # Associate each GT actor to the closest output track at frame 10 and
    # check the same ID stays closest through the clip.
    assign = {}
    for a in range(3):
        d = [
            (np.linalg.norm(o["pose3d"] - scene.gt3d[10][a], axis=-1).mean(), o["id"])
            for o in per_frame[10]
        ]
        assign[a] = min(d)[1]
    assert len(set(assign.values())) == 3
    for t in range(15, 40, 5):
        for a in range(3):
            d = [
                (np.linalg.norm(o["pose3d"] - scene.gt3d[t][a], axis=-1).mean(), o["id"])
                for o in per_frame[t]
            ]
            assert min(d)[1] == assign[a], f"ID switch at frame {t} actor {a}"


def test_oracle_survives_dropouts():
    scene = make_scene(
        num_frames=40, num_cameras=5, num_actors=2, noise_px=1.0, drop_prob=0.25, seed=3
    )
    tracker = _make_tracker(scene)
    per_frame = _run(scene, tracker)
    late_errors = [
        e for t in range(20, 40) for e in _match_error(per_frame[t], scene.gt3d[t])
        if np.isfinite(e)
    ]
    assert len(late_errors) >= 30  # tracks exist most of the time
    assert np.mean(late_errors) < 0.08
