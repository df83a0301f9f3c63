"""Tests for auxiliary components: filters, BIP matcher, limb sanity, MOT
metrics, affinities, checkpointing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.eval.mot import evaluate_mot
from tpupose.ops.affinity import embedding_affinity, pairwise_affinity
from tpupose.tracking.bip import bip_matching, solve_clique_partition
from tpupose.tracking.filters import (
    OneEuroFilter,
    kalman_correct,
    kalman_init,
    kalman_matrices,
    kalman_predict,
    one_euro_apply,
    one_euro_init,
)
from tpupose.utils.limbs import SENSIBLE_LIMB_LENGTH, correct_limbs_mask


# -- One-Euro ----------------------------------------------------------------

def _reference_one_euro(values, times, freq, mincutoff, beta, dcutoff):
    """Direct transcription of the Casiez filter
    (`src/tracking/OneEuroFilter.py`) for cross-checking."""
    import math

    x_prev = None
    dx_prev = 0.0
    t_prev = None
    out = []

    def alpha(cutoff, f):
        te = 1.0 / f
        tau = 1.0 / (2 * math.pi * cutoff)
        return 1.0 / (1.0 + tau / te)

    f = freq
    for x, t in zip(values, times):
        if t_prev is not None and t is not None:
            f = 1.0 / (t - t_prev)
        t_prev = t
        if x_prev is None:
            x_prev = x
            out.append(x)
            continue
        dx = (x - x_prev) * f
        a_d = alpha(dcutoff, f)
        dx_prev = a_d * dx + (1 - a_d) * dx_prev
        cutoff = mincutoff + beta * abs(dx_prev)
        a = alpha(cutoff, f)
        x_prev = a * x + (1 - a) * x_prev
        out.append(x_prev)
    return out


def test_one_euro_scalar_matches_reference_formula():
    rng = np.random.default_rng(0)
    values = np.sin(np.linspace(0, 3, 40)) + rng.normal(scale=0.1, size=40)
    times = np.arange(40) / 25.0
    f = OneEuroFilter(freq=25, mincutoff=0.8, beta=0.4, dcutoff=0.4)
    ours = [f(v, t) for v, t in zip(values, times)]
    ref = _reference_one_euro(values, times, 25, 0.8, 0.4, 0.4)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_one_euro_batched_smooths():
    rng = np.random.default_rng(1)
    signal = np.sin(np.linspace(0, 6, 100))[:, None] + rng.normal(
        scale=0.2, size=(100, 8)
    )
    state = one_euro_init((8,))
    outs = []
    for t in range(100):
        state, y = one_euro_apply(state, jnp.asarray(signal[t]), t / 25.0)
        outs.append(np.asarray(y))
    outs = np.stack(outs)
    clean = np.sin(np.linspace(0, 6, 100))[:, None]
    raw_err = np.abs(signal[30:] - clean[30:]).mean()
    fil_err = np.abs(outs[30:] - clean[30:]).mean()
    assert fil_err < raw_err


def test_kalman_tracks_constant_velocity():
    mats = kalman_matrices()
    state = kalman_init(jnp.array([0.0, 0.0, 0.0]))
    dt = 1 / 25.0
    pred = None
    for t in range(1, 60):
        pos = np.array([0.5 * t * dt, -0.2 * t * dt, 1.0])
        state, pred = kalman_predict(state, mats)
        state = kalman_correct(state, jnp.asarray(pos), mats)
    state, pred = kalman_predict(state, mats)
    expected = np.array([0.5 * 60 * dt, -0.2 * 60 * dt, 1.0])
    assert np.linalg.norm(np.asarray(pred) - expected) < 0.05


# -- BIP ----------------------------------------------------------------------

def test_clique_partition_separates_groups():
    # Two groups of 2 with strong intra-affinity, negative cross.
    aff = np.array(
        [
            [0, 5, -5, -5],
            [5, 0, -5, -5],
            [-5, -5, 0, 5],
            [-5, -5, 5, 0],
        ],
        float,
    )
    clusters = solve_clique_partition(aff)
    assert sorted(map(tuple, clusters)) == [(0, 1), (2, 3)]


def test_clique_partition_frozen_edges():
    aff = np.array([[0, np.inf, -1], [np.inf, 0, -1], [-1, -1, 0]], float)
    clusters = solve_clique_partition(aff)
    assert [0, 1] in clusters and [2] in clusters


def test_bip_matching_on_synthetic_views():
    from tpupose.data.synthetic import make_scene
    from tpupose.geometry import make_camera_set

    scene = make_scene(num_frames=1, num_cameras=3, num_actors=2, noise_px=1.0,
                       seed=4)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    # nodes: (cam, actor) pairs in camera-major order
    poses = []
    cam_of = []
    for c in range(3):
        for a in range(2):
            poses.append(scene.detections[0, c, a])
            cam_of.append(c)
    clusters = bip_matching(
        np.asarray(rig.F), np.array(cam_of), np.stack(poses), threshold=40.0
    )
    # each actor's nodes are {a, a+2, a+4}
    assert sorted(map(tuple, clusters)) == [(0, 2, 4), (1, 3, 5)]


# -- limbs ---------------------------------------------------------------------

def test_correct_limbs_mask():
    pose = np.zeros((14, 3))
    # plausible left arm: shoulder(5), elbow(6), hand(7)
    pose[5] = [0, 0, 1.5]
    pose[6] = [0.25, 0, 1.3]
    pose[7] = [0.45, 0, 1.1]
    pose[2] = [0.5, 0, 1.5]
    pose[3] = [5.0, 0, 1.3]   # right elbow absurdly far -> drop 3 and 4
    pose[4] = [5.2, 0, 1.1]
    pose[8] = [0.4, 0, 0.95]
    pose[9] = [0.42, 0, 0.5]
    pose[10] = [0.44, 0, 0.05]
    pose[11] = [0.1, 0, 0.95]
    pose[12] = [0.12, 0, 0.5]
    pose[13] = [0.14, 0, 0.05]
    ok = correct_limbs_mask(pose)
    assert not ok[3] and not ok[4]
    assert ok[6] and ok[7] and ok[9] and ok[12]


# -- MOT -----------------------------------------------------------------------

def _pose_at(x):
    p = np.zeros((17, 3))
    p[:, 0] = x
    return p


def test_mot_perfect_tracking():
    gt = [{0: _pose_at(0.1 * t), 1: _pose_at(5 + 0.1 * t)} for t in range(20)]
    pred = [{10: _pose_at(0.1 * t), 11: _pose_at(5 + 0.1 * t)} for t in range(20)]
    m = evaluate_mot(gt, pred)
    assert m["mota"] == 1.0
    assert m["idf1"] == 1.0
    assert m["id_switches"] == 0


def test_mot_id_switch_detected():
    gt = [{0: _pose_at(0.0), 1: _pose_at(5.0)} for t in range(20)]
    pred = []
    for t in range(20):
        if t < 10:
            pred.append({10: _pose_at(0.0), 11: _pose_at(5.0)})
        else:  # identities swap
            pred.append({11: _pose_at(0.0), 10: _pose_at(5.0)})
    m = evaluate_mot(gt, pred)
    assert m["id_switches"] == 2
    assert m["idf1"] == 0.5
    assert m["mota"] == pytest.approx(1.0 - 2 / 40)


def test_mot_misses_and_fp():
    gt = [{0: _pose_at(0.0)} for _ in range(10)]
    pred = [{5: _pose_at(0.0)} if t < 5 else {5: _pose_at(50.0)} for t in range(10)]
    m = evaluate_mot(gt, pred)
    assert m["misses"] == 5
    assert m["false_positives"] == 5


# -- affinities ------------------------------------------------------------------

def test_embedding_affinity_cosine():
    q = np.array([[1.0, 0.0], [0.0, 1.0]])
    g = np.array([[1.0, 0.0], [-1.0, 0.0]])
    aff = np.asarray(embedding_affinity(q, g))
    assert aff[0, 0] == pytest.approx(1.0)
    assert aff[0, 1] == pytest.approx(-1.0)
    assert aff[1, 0] == pytest.approx(0.0, abs=1e-6)


def test_pairwise_affinity_orders():
    q = np.array([[0.0, 0.0], [10.0, 10.0]])
    g = np.array([[0.1, 0.0], [10.0, 9.9]])
    aff = np.asarray(pairwise_affinity(q, g))
    assert aff[0, 0] > aff[0, 1]
    assert aff[1, 1] > aff[1, 0]


# -- checkpoint -------------------------------------------------------------------

def test_orbax_roundtrip(tmp_path):
    from tpupose.models.checkpoint import restore_params, save_params

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"w": jnp.ones(4)}}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    back = restore_params(path, like=params)
    np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(params["a"]))
    np.testing.assert_allclose(np.asarray(back["b"]["w"]), np.ones(4))


def test_bundle_serving_only_fields_do_not_pin(tmp_path):
    # decode_refine / int8_resident select a serving-time execution mode
    # without changing the stored weights: a bundle converted under one
    # value must load under another, while a real topology mismatch
    # (e.g. width) must still fail loudly.
    import dataclasses

    import pytest

    from tpupose.cli.convert import load_bundle, write_bundle
    from tpupose.models.hrnet import HRNetConfig
    from tpupose.models.yolov3 import YoloConfig

    det_cfg = YoloConfig(max_candidates=4)
    pose_cfg = HRNetConfig(width=8, decode_refine="quarter")
    det_params = {"conv0": {"weight": jnp.ones((3, 3, 3, 4))}}
    pose_params = {"conv1": {"weight": jnp.ones((3, 3, 3, 8))}}
    out = str(tmp_path / "bundle")
    write_bundle(out, det_cfg, det_params, pose_cfg, pose_params)

    d, p = load_bundle(
        out, det_cfg, dataclasses.replace(pose_cfg, decode_refine="parabolic")
    )
    np.testing.assert_allclose(
        np.asarray(p["conv1"]["weight"], np.float32), 1.0
    )
    with pytest.raises(ValueError, match="width"):
        load_bundle(out, det_cfg, dataclasses.replace(pose_cfg, width=16))
