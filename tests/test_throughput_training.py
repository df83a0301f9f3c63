"""Throughput-mode pipeline test (streams sharded over the CPU mesh) and
training-step convergence test."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.models.hrnet import hrnet_apply, hrnet_init, tiny_test_config
from tpupose.models.train import (
    gaussian_target_heatmaps,
    heatmap_loss,
    make_optimizer,
    make_train_step,
)
from tpupose.models.yolov3 import tiny_yolo_test_config, yolov3_init
from tpupose.parallel import make_mesh, shard_streams
from tpupose.parallel.streams import broadcast_cameras, init_multistream_state
from tpupose.parallel.throughput import make_multistream_clip_fn
from tpupose.tracking.tracker import TrackerConfig


def test_multistream_clip_pipeline_runs_sharded():
    S, F, C, H, W = 4, 2, 3, 96, 128
    scene = make_scene(num_frames=1, num_cameras=C, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, W, H)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=C, max_dets=8, max_tracks=8, max_hyp=16)
    det_params = yolov3_init(jax.random.PRNGKey(0), det_cfg)
    pose_params = hrnet_init(jax.random.PRNGKey(1), pose_cfg)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    cams_s = shard_streams(mesh, broadcast_cameras(rig, S))
    states_s = shard_streams(mesh, init_multistream_state(tcfg, S))
    rng = np.random.default_rng(0)
    clip = shard_streams(
        mesh,
        jnp.asarray(rng.integers(0, 255, size=(S, F, C, H, W, 3), dtype=np.uint8)),
    )
    fids = shard_streams(
        mesh, jnp.tile(jnp.arange(F, dtype=jnp.int32)[None], (S, 1))
    )
    fn = make_multistream_clip_fn(det_cfg, pose_cfg, tcfg, (H, W))
    new_states, outs = fn(det_params, pose_params, cams_s, states_s, clip, fids)
    assert np.asarray(outs.pose3d).shape == (S, F, tcfg.max_tracks, 17, 3)
    assert np.isfinite(np.asarray(new_states.hist_pose)).all()


def test_multistream_chunked_stage_a_matches_unchunked():
    """Stage-A frame-chunking (the HBM/bench shape at big F) is numerically
    exact — every stage-A op is per-image — and keeps stream sharding."""
    S, F, C, H, W = 4, 4, 3, 96, 128
    scene = make_scene(num_frames=1, num_cameras=C, num_actors=2, seed=3)
    rig = make_camera_set(scene.P, scene.K, scene.RT, W, H)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=C, max_dets=8, max_tracks=8, max_hyp=16)
    det_params = yolov3_init(jax.random.PRNGKey(0), det_cfg)
    pose_params = hrnet_init(jax.random.PRNGKey(1), pose_cfg)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    cams_s = shard_streams(mesh, broadcast_cameras(rig, S))
    rng = np.random.default_rng(7)
    clip = shard_streams(
        mesh,
        jnp.asarray(rng.integers(0, 255, size=(S, F, C, H, W, 3), dtype=np.uint8)),
    )
    fids = shard_streams(
        mesh, jnp.tile(jnp.arange(F, dtype=jnp.int32)[None], (S, 1))
    )

    fn_whole = make_multistream_clip_fn(det_cfg, pose_cfg, tcfg, chunk_frames=F)
    fn_chunk = make_multistream_clip_fn(det_cfg, pose_cfg, tcfg, chunk_frames=2)
    st_w, out_w = fn_whole(
        det_params, pose_params, cams_s,
        shard_streams(mesh, init_multistream_state(tcfg, S)), clip, fids,
    )
    st_c, out_c = fn_chunk(
        det_params, pose_params, cams_s,
        shard_streams(mesh, init_multistream_state(tcfg, S)), clip, fids,
    )
    np.testing.assert_array_equal(
        np.asarray(out_w.track_id), np.asarray(out_c.track_id)
    )
    np.testing.assert_allclose(
        np.asarray(out_w.pose3d), np.asarray(out_c.pose3d), atol=1e-5
    )
    # stream sharding survives the chunked scan
    for leaf in jax.tree.leaves(st_c) + jax.tree.leaves(out_c):
        spec = leaf.sharding.spec
        assert len(spec) >= 1 and spec[0] == "data", f"bad sharding {spec}"


def test_auto_chunk_sizes():
    from tpupose.parallel.throughput import _auto_chunk

    # bench shape: S=2, C=5 -> 16 frames/chunk = 160 images/step
    assert _auto_chunk(2, 128, 5) == 16
    # must divide F
    assert 48 % _auto_chunk(2, 48, 5) == 0
    # tiny shapes degrade to >= 1
    assert _auto_chunk(4, 2, 3) >= 1


def test_train_step_reduces_loss():
    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(lr=3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, optimizer, compute_dtype=jnp.float32))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, cfg.input_size[0], cfg.input_size[1], 3)).astype(
            np.float32
        )
    )
    kps = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.uniform(4, cfg.input_size[1] - 4, size=cfg.num_joints),
                        rng.uniform(4, cfg.input_size[0] - 4, size=cfg.num_joints),
                        np.ones(cfg.num_joints),
                    ],
                    axis=1,
                )
                for _ in range(4)
            ]
        ).astype(np.float32)
    )
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    loss0 = float(heatmap_loss(params, cfg, images, targets, weights, jnp.float32))
    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state, images, targets, weights)
        losses.append(float(loss))
    assert losses[-1] < loss0 * 0.7, (loss0, losses)


def test_gaussian_targets_peak_at_keypoints():
    cfg = tiny_test_config()
    kps = jnp.asarray(
        np.array([[[16.0, 24.0, 1.0]] * cfg.num_joints], np.float32)
    )
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    hh, wh = cfg.heatmap_size
    t = np.asarray(targets)[0, :, :, 0]
    iy, ix = np.unravel_index(np.argmax(t), t.shape)
    assert (iy, ix) == (6, 4)  # 24/4, 16/4
    assert np.asarray(weights).all()


def test_train_bn_matches_calibrated_inference_forward():
    """Train-mode BN self-consistency: a train_bn forward equals
    (calibrate_bn_stats on the same batch -> inference forward) EXACTLY —
    each BN normalizes by its input's batch statistics either way. This
    pins the semantics make_train_step(train_bn=True) relies on (training
    at real depth; see heatmap_loss docstring) and that running-stat
    leaves receive zero gradients under train_bn."""
    from tpupose.models.layers import BNStatRecorder
    from tpupose.models.quantize import calibrate_bn_stats
    from tpupose.models.train import blob_localization_batch

    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(5), cfg)
    imgs, _ = blob_localization_batch(np.random.default_rng(6), cfg, 2)

    prev = BNStatRecorder.active
    BNStatRecorder.active = BNStatRecorder()
    try:
        heat_train = np.asarray(
            hrnet_apply(params, cfg, imgs, compute_dtype=jnp.float32)
        )
    finally:
        BNStatRecorder.active = prev

    calibrate_bn_stats(
        lambda x: hrnet_apply(params, cfg, x, compute_dtype=jnp.float32), imgs
    )
    heat_inf = np.asarray(
        hrnet_apply(params, cfg, imgs, compute_dtype=jnp.float32)
    )
    rng_h = heat_train.max() - heat_train.min()
    assert np.abs(heat_train - heat_inf).max() <= 1e-4 * rng_h

    # running stats are unused in the train_bn forward -> zero gradients
    from tpupose.models.train import heatmap_loss

    kps = jnp.zeros((2, cfg.num_joints, 3), jnp.float32)
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    grads = jax.grad(heatmap_loss)(
        params, cfg, imgs, targets, weights, jnp.float32, True
    )

    def check(node):
        if isinstance(node, dict):
            if "running_var" in node:
                assert float(np.abs(np.asarray(node["running_var"])).max()) == 0.0
                assert float(np.abs(np.asarray(node["running_mean"])).max()) == 0.0
            for v in node.values():
                if isinstance(v, dict):
                    check(v)

    check(grads)
