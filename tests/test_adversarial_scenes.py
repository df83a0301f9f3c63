"""Adversarial-scene tracker tests: crossing/occluding actors, false-positive
detections, detection-order shuffling, dropouts below the 2-view floor, and
the capacity-overflow boundary where jit and oracle are ALLOWED to diverge.

These scenes supply the failure modes the smooth `make_scene` walks never
exercise (VERDICT r1: Shelf/Campus are hard because of occlusion and crossing
identities). They also caught a real bug: `masked_lap`'s fixed 1e6 padding
destroyed ~1e-2 affinity differences in f32 (see the regression test at the
bottom), silently randomizing association in low-affinity frames.

Parity scope (documented): the jit tracker is specified by the numpy oracle
and matches it step-by-step — except (a) capacity overflow (fixed-size slots
vs unbounded lists; jit keeps the FIRST hypotheses in spawn order and still
advances next_id past the dropped ones so later IDs stay aligned), and
(b) knife-edge decisions: the oracle runs float64, the jit tracker float32,
so a crossing scene that pushes costs onto veto/gate boundaries can
eventually flip one discrete decision after which histories diverge. The
prefix test pins how long exact parity must hold on such a scene; the
robustness tests bound the jit tracker's behavior through the chaos itself.
"""
import numpy as np
import jax.numpy as jnp

from tpupose.data.synthetic import make_adversarial_scene
from tpupose.eval.mot import evaluate_mot
from tpupose.geometry import make_camera_set
from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras
from tpupose.tracking.tracker import TrackerConfig, init_state, make_step_fn
from tpupose.utils.validate import assert_tracker_invariants

CFG_KW = dict(max_dets=8, max_tracks=10, max_hyp=24)


def _run_jit(scene, cfg, check_invariants=True):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    step = make_step_fn(cfg)
    state = init_state(cfg)
    gt_frames, pred_frames = [], []
    for t in range(scene.num_frames):
        dets = np.zeros((scene.num_cameras, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), cfg.max_dets)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        if check_invariants:
            assert_tracker_invariants(state, cfg)
        valid = np.asarray(out.valid)
        ids = np.asarray(out.track_id)[valid]
        poses = np.asarray(out.pose3d)[valid]
        pred_frames.append({int(i): p for i, p in zip(ids, poses)})
        gt_frames.append(
            {a: scene.gt3d[t, a] for a in range(scene.num_actors)}
        )
    return state, gt_frames, pred_frames


def test_crossing_actors_recovery():
    """All actors cross at the scene center with view-dependent occlusion.
    Identity may churn during the crossing, but the tracker must survive it
    (invariants hold) and RE-LOCK afterward: the post-crossing tail is
    cleanly tracked with zero further switches."""
    scene = make_adversarial_scene(num_frames=40, num_cameras=5, num_actors=3,
                                   seed=7)
    cfg = TrackerConfig(num_cameras=5, **CFG_KW)
    state, gt, pr = _run_jit(scene, cfg)
    m = evaluate_mot(gt[4:], pr[4:], dist_threshold=0.3)
    assert m["id_switches"] <= 6, m
    assert m["mota"] > 0.5, m
    tail = evaluate_mot(gt[30:], pr[30:], dist_threshold=0.3)
    assert tail["idf1"] > 0.8, tail
    assert tail["mota"] > 0.7, tail
    assert tail["id_switches"] == 0, tail


def test_false_positives_never_confirm():
    """One plausible-confidence (0.75) false positive per view per frame at a
    random displaced location: FPs may seed hypotheses, but cross-view
    epipolar consistency must keep them from ever becoming confirmed
    tracks."""
    scene = make_adversarial_scene(num_frames=40, num_cameras=5, num_actors=3,
                                   seed=8, fp_per_view=1)
    cfg = TrackerConfig(num_cameras=5, **CFG_KW)
    state, gt, pr = _run_jit(scene, cfg)
    active = np.asarray(state.active)
    confirmed = np.asarray(state.confirmed) & active
    assert confirmed.sum() == 3, f"FP-born confirmed tracks: {confirmed.sum()}"
    m = evaluate_mot(gt[4:], pr[4:], dist_threshold=0.3)
    assert m["id_switches"] <= 6, m


def test_dropouts_below_two_view_floor():
    """45% i.i.d. dropouts WITHOUT the >=2-view repair: actors intermittently
    fall below the triangulation floor and their tracks coast on motion
    prediction; identities must hold across the gaps (max_age=10)."""
    scene = make_adversarial_scene(
        num_frames=40, num_cameras=5, num_actors=3, seed=9, crossing=False,
        occlusion_px=0.0, drop_prob=0.45, enforce_two_views=False,
    )
    cfg = TrackerConfig(num_cameras=5, **CFG_KW)
    state, gt, pr = _run_jit(scene, cfg)
    m = evaluate_mot(gt[6:], pr[6:], dist_threshold=0.3)
    assert m["idf1"] > 0.9, m
    assert m["id_switches"] == 0, m


def _parity_frames(scene, cfg, params=None):
    """Run oracle + jit in lockstep; return the first frame where discrete
    decisions diverge (or num_frames if never), plus worst pose drift while
    in sync."""
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, params or TrackerParams())
    step = make_step_fn(cfg)
    state = init_state(cfg)
    worst = 0.0
    for t in range(scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((scene.num_cameras, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, out = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        ref_ids = sorted(tr.track_id for tr in oracle.tracks)
        got_ids = sorted(
            np.asarray(state.track_id)[np.asarray(state.active)].tolist()
        )
        if ref_ids != got_ids:
            return t, worst
        for tr in oracle.tracks:
            slot = np.where(
                (np.asarray(state.track_id) == tr.track_id)
                & np.asarray(state.active)
            )[0][0]
            hc = int(np.asarray(state.hist_count)[slot])
            jp = np.asarray(state.hist_pose)[slot, hc - 1]
            worst = max(worst, float(np.abs(jp - tr.history[-1][1]).max()))
    return scene.num_frames, worst


def test_oracle_parity_dropouts_and_shuffle():
    """Strict decision parity through 40 frames of heavy dropout + shuffled
    detection order (pose drift stays in the f32-vs-f64 regime)."""
    scene = make_adversarial_scene(
        num_frames=40, num_cameras=5, num_actors=3, seed=9, crossing=False,
        occlusion_px=0.0, drop_prob=0.45, enforce_two_views=False,
    )
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=16, max_hyp=40)
    diverged_at, drift = _parity_frames(scene, cfg)
    assert diverged_at == scene.num_frames, f"diverged at {diverged_at}"
    assert drift < 5e-2, drift  # accumulated f32 drift, not a semantic gap


def test_oracle_parity_fp_and_crossing_prefix():
    """On the crossing+FP scene, exact decision parity must hold at least
    until the crossing climax (accumulated f32 drift may flip a knife-edge
    decision there — the documented precision boundary, not a semantic
    bug)."""
    scene = make_adversarial_scene(num_frames=40, num_cameras=5, num_actors=3,
                                   seed=8, fp_per_view=1)
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=16, max_hyp=40)
    diverged_at, _ = _parity_frames(scene, cfg)
    assert diverged_at >= 20, f"diverged too early: {diverged_at}"


def test_capacity_overflow_boundary():
    """The documented jit/oracle divergence: with more simultaneous new
    actors than track slots, the oracle (unbounded lists) keeps them all;
    the jit tracker keeps the FIRST max_tracks hypotheses in spawn order.
    next_id advances past dropped hypotheses too (IDs may skip under
    sustained overflow — the unclaimed actors re-spawn-and-drop every frame
    — but remain strictly monotone and never collide)."""
    scene = make_adversarial_scene(num_frames=6, num_cameras=5, num_actors=6,
                                   seed=13, crossing=False, occlusion_px=0.0,
                                   shuffle=False)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    oracle = OracleTracker(cams_np, TrackerParams())
    cfg = TrackerConfig(num_cameras=5, max_dets=8, max_tracks=4, max_hyp=24)
    step = make_step_fn(cfg)
    state = init_state(cfg)
    prev_next_id = 0
    for t in range(scene.num_frames):
        oracle.step(t, scene.detections_list(t))
        dets = np.zeros((5, cfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((5, cfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state, _ = step(rig, state, jnp.asarray(dets), jnp.asarray(mask), t)
        assert_tracker_invariants(state, cfg)
        nid = int(np.asarray(state.next_id))
        assert nid >= prev_next_id  # monotone, no collisions possible
        prev_next_id = nid
        if t == 0:
            # First overflow frame: both spawn 6 hypotheses; jit keeps the
            # first 4 slots but counts all 6, exactly like the oracle.
            assert nid == oracle.next_id == 6

    oracle_ids = sorted(tr.track_id for tr in oracle.tracks)
    jit_ids = sorted(
        np.asarray(state.track_id)[np.asarray(state.active)].tolist()
    )
    assert len(oracle_ids) == 6
    assert jit_ids == oracle_ids[:4]  # first four in spawn order


def test_masked_lap_small_affinity_regression():
    """Regression for the PAD_COST precision bug: with tiny (~1e-2) affinity
    differences in a mostly-masked matrix, the assignment must still match
    scipy's optimum (the fixed 1e6 pad used to erase them in f32)."""
    from scipy.optimize import linear_sum_assignment

    from tpupose.ops import masked_lap

    aff = np.zeros((16, 8), np.float32)
    aff[0, 1] = 0.040564
    aff[1, 0] = 0.025147
    aff[2, 3] = 0.028514
    rv = np.zeros(16, bool)
    rv[:3] = True
    cv = np.zeros(8, bool)
    cv[:4] = True
    col = np.asarray(
        masked_lap(jnp.asarray(aff), jnp.asarray(rv), jnp.asarray(cv),
                   maximize=True)
    )
    assert col[:3].tolist() == [1, 0, 3]

    rng = np.random.default_rng(0)
    for _ in range(60):
        R, C = rng.integers(1, 12, 2)
        scale = float(rng.choice([1e-3, 1e-2, 1.0, 50.0]))
        cost = rng.normal(scale=scale, size=(R, C)).astype(np.float32)
        rv = rng.uniform(size=R) < 0.8
        cv = rng.uniform(size=C) < 0.8
        col = np.asarray(
            masked_lap(jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv))
        )
        if rv.sum() == 0 or cv.sum() == 0:
            assert (col == -1).all()
            continue
        sub = cost[np.ix_(rv.nonzero()[0], cv.nonzero()[0])]
        r, c = linear_sum_assignment(sub)
        total = sum(cost[i, col[i]] for i in range(R) if col[i] >= 0)
        assert (col >= 0).sum() == len(r)
        np.testing.assert_allclose(
            total, sub[r, c].sum(), rtol=1e-4, atol=1e-5 * max(1.0, scale)
        )
