"""Two-stage clip pipeline must produce the same results as the per-frame
fused pipeline (same models, same state evolution)."""
import numpy as np
import jax

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.models.hrnet import hrnet_init, tiny_test_config
from tpupose.models.layers import fold_batchnorm
from tpupose.models.yolov3 import tiny_yolo_test_config, yolov3_init
from tpupose.pipeline.facade import Pipeline
from tpupose.tracking.tracker import TrackerConfig


def _make_pipe(scene, fold=False):
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=scene.num_cameras, max_dets=8,
                         max_tracks=8, max_hyp=16)
    det_params = yolov3_init(jax.random.PRNGKey(0), det_cfg)
    pose_params = hrnet_init(jax.random.PRNGKey(1), pose_cfg)
    if fold:
        det_params = fold_batchnorm(det_params)
        pose_params = fold_batchnorm(pose_params)
    return Pipeline(
        cams=rig, tracker_cfg=tcfg, det_cfg=det_cfg, det_params=det_params,
        pose_cfg=pose_cfg, pose_params=pose_params,
    )


def test_clip_equals_per_frame():
    scene = make_scene(num_frames=4, num_cameras=3, num_actors=2, seed=0)
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(4, 3, 96, 128, 3), dtype=np.uint8)

    pipe_a = _make_pipe(scene)
    outs_a = []
    dets_a = []
    for t in range(4):
        out, dets, mask = pipe_a.process_frame(t, clip[t])
        outs_a.append(out)
        dets_a.append(np.asarray(dets))

    pipe_b = _make_pipe(scene)
    outs_b, dets_b, mask_b = pipe_b.process_clip(np.arange(4), clip)

    np.testing.assert_allclose(
        np.stack(dets_a), np.asarray(dets_b), atol=2e-2, rtol=1e-3
    )
    for t in range(4):
        np.testing.assert_array_equal(
            np.asarray(outs_a[t].valid), np.asarray(outs_b.valid[t])
        )
    np.testing.assert_allclose(
        np.asarray(pipe_a.state.hist_pose), np.asarray(pipe_b.state.hist_pose),
        atol=1e-4,
    )


def test_bn_folding_exact_at_heatmap_level():
    # Folding must be exact to f32 rounding on the raw network outputs
    # (keypoint argmax on random-weight near-flat heatmaps is chaotic, so we
    # compare heatmaps, not decoded keypoints).
    import jax.numpy as jnp

    from tpupose.models.hrnet import hrnet_apply

    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(3), cfg)
    # Give BN stats non-trivial values.
    rng = np.random.default_rng(3)

    def jitter(x):
        if x.ndim == 1:
            return jnp.abs(x + 0.2 * rng.normal(size=x.shape).astype(np.float32)) + 0.1
        return x

    params = jax.tree.map(jitter, params)
    folded = fold_batchnorm(params)
    x = jnp.asarray(rng.normal(size=(2, cfg.input_size[0], cfg.input_size[1], 3))
                    .astype(np.float32))
    a = hrnet_apply(params, cfg, x, jnp.float32)
    b = hrnet_apply(folded, cfg, x, jnp.float32)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-3 * max(scale, 1.0)


def test_clips_nn_batch_equals_single():
    scene = make_scene(num_frames=2, num_cameras=3, num_actors=2, seed=3)
    rng = np.random.default_rng(3)
    clips = rng.integers(0, 255, size=(2, 2, 3, 64, 96, 3), dtype=np.uint8)
    pipe = _make_pipe(scene, fold=True)
    ds, ms = pipe.process_clips_nn(clips)
    assert ds.shape[:2] == (2, 2) and ms.shape[:2] == (2, 2)
    d0, m0 = pipe.process_clip_nn(clips[0])
    np.testing.assert_allclose(np.asarray(ds[0]), np.asarray(d0), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ms[0]), np.asarray(m0))
