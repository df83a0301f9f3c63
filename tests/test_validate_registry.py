"""Validation utilities and registry tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.tracking.tracker import TrackerConfig, init_state, make_step_fn
from tpupose.utils.registry import DETECTORS, INIT_METHODS, MATCHERS, POSE_MODELS
from tpupose.utils.validate import assert_tracker_invariants, checked_finite


def test_tracker_invariants_hold_over_sequence():
    scene = make_scene(num_frames=15, num_cameras=4, num_actors=2,
                       noise_px=1.0, drop_prob=0.2, seed=9)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cfg = TrackerConfig(num_cameras=4, max_dets=6, max_tracks=8, max_hyp=16)
    step = make_step_fn(cfg)
    state = init_state(cfg)
    for t in range(scene.num_frames):
        dets = np.zeros((4, 6, 17, 3), np.float32)
        mask = np.zeros((4, 6), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, _ = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        assert_tracker_invariants(state, cfg)


def test_checked_finite_catches_nan():
    def bad(x):
        return x / (x - x)  # 0/0 -> NaN

    err, out = checked_finite(bad)(jnp.ones(3))
    with pytest.raises(Exception):
        err.throw()

    def good(x):
        return x * 2

    err, out = checked_finite(good)(jnp.ones(3))
    err.throw()
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_registries_populated():
    import tpupose.pipeline.registry_defs  # noqa: F401

    assert "yolov3" in DETECTORS.names()
    assert "hrpose" in POSE_MODELS.names()
    assert "iterative" in MATCHERS.names()
    assert set(INIT_METHODS.names()) >= {"gd", "bip"}
    with pytest.raises(KeyError):
        DETECTORS.get("nonexistent")
