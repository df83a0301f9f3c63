"""Jitted tracker vs numpy oracle: step-by-step behavioral parity.

The oracle (tpupose.tracking.oracle) encodes the reference algorithm's exact
semantics; the jitted tracker must make identical discrete decisions (track
ids, lifecycles, view selection) and numerically matching poses (f32 vs f64
differences only) on synthetic scenes with noise and dropouts.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import CONFIRMED, OracleTracker, TrackerParams, _Cameras
from tpupose.tracking.tracker import (
    TrackerConfig,
    init_state,
    make_step_fn,
    track_clip,
)


def _setup(scene, **kw):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, TrackerParams(**kw))
    cfg = TrackerConfig(num_cameras=scene.num_cameras, **kw)
    return rig, oracle, cfg


def _padded_dets(scene, t, cfg):
    dets = np.zeros((scene.num_cameras, cfg.max_dets, 17, 3), np.float32)
    mask = np.zeros((scene.num_cameras, cfg.max_dets), bool)
    for c, d in enumerate(scene.detections_list(t)):
        n = len(d)
        dets[c, :n] = d
        mask[c, :n] = True
    return dets, mask


def _oracle_summary(oracle):
    return {
        t.track_id: (t.state, t.hits, t.time_since_update, t.history[-1][1])
        for t in oracle.tracks
    }


def _state_summary(state):
    out = {}
    active = np.asarray(state.active)
    conf = np.asarray(state.confirmed)
    ids = np.asarray(state.track_id)
    hits = np.asarray(state.hits)
    tsu = np.asarray(state.time_since_update)
    counts = np.asarray(state.hist_count)
    hist = np.asarray(state.hist_pose)
    for i in range(len(ids)):
        if active[i]:
            st = CONFIRMED if conf[i] else 1
            out[int(ids[i])] = (st, int(hits[i]), int(tsu[i]), hist[i, counts[i] - 1])
    return out


@pytest.mark.parametrize(
    "scene_kw",
    [
        dict(num_frames=25, num_cameras=4, num_actors=2, noise_px=0.8, seed=1),
        dict(num_frames=30, num_cameras=5, num_actors=3, noise_px=1.2,
             drop_prob=0.2, seed=2),
        dict(num_frames=25, num_cameras=3, num_actors=2, noise_px=1.5,
             drop_prob=0.3, seed=3),
    ],
)
def test_jitted_tracker_matches_oracle(scene_kw):
    scene = make_scene(**scene_kw)
    rig, oracle, cfg = _setup(scene)
    step = make_step_fn(cfg)
    state = init_state(cfg)

    for t in range(scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets, mask = _padded_dets(scene, t, cfg)
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)

        ref = _oracle_summary(oracle)
        got = _state_summary(state)
        assert set(ref) == set(got), f"frame {t}: ids ref={set(ref)} got={set(got)}"
        for tid in ref:
            rs, rh, rt, rp = ref[tid]
            gs, gh, gt, gp = got[tid]
            assert (rs, rh, rt) == (gs, gh, gt), (
                f"frame {t} track {tid}: state ref={(rs, rh, rt)} got={(gs, gh, gt)}"
            )
            err = np.abs(rp - gp).max()
            assert err < 5e-3, f"frame {t} track {tid}: pose err {err}"

        # Output harvest parity
        ref_out = {o["id"]: o for o in oracle.outputs(t)}
        valid = np.asarray(out.valid)
        got_ids = set(np.asarray(out.track_id)[valid].tolist())
        assert got_ids == set(ref_out), f"frame {t}: outputs {got_ids} vs {set(ref_out)}"


def test_scan_matches_stepwise():
    scene = make_scene(num_frames=20, num_cameras=4, num_actors=2, noise_px=1.0, seed=5)
    rig, _, cfg = _setup(scene)
    step = make_step_fn(cfg)

    state_a = init_state(cfg)
    outs = []
    all_dets, all_masks = [], []
    for t in range(scene.num_frames):
        dets, mask = _padded_dets(scene, t, cfg)
        all_dets.append(dets)
        all_masks.append(mask)
        state_a, o = step(rig, state_a, jnp.asarray(dets), jnp.asarray(mask), t)
        outs.append(o)

    import jax

    scan_fn = jax.jit(
        lambda st, d, m, f: track_clip(cfg, rig, st, d, m, f)
    )
    state_b, scan_out = scan_fn(
        init_state(cfg),
        jnp.asarray(np.stack(all_dets)),
        jnp.asarray(np.stack(all_masks)),
        jnp.arange(scene.num_frames, dtype=jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(state_a.hist_pose), np.asarray(state_b.hist_pose), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(state_a.track_id), np.asarray(state_b.track_id)
    )
    for t in range(scene.num_frames):
        np.testing.assert_array_equal(
            np.asarray(outs[t].valid), np.asarray(scan_out.valid[t])
        )
