"""Width-packing reparameterization: exactness of the packed conv and of
the packed HRNet branch-0 serving path (float and int8), incl. padding
edges. See tpupose/ops/packing.py."""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.models.hrnet import hrnet_apply, hrnet_init, tiny_test_config
from tpupose.models.layers import conv_apply, fold_batchnorm
from tpupose.ops.packing import (
    pack_conv_dict_width,
    pack_hrnet_branch0,
    pack_width,
    unpack_width,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack_width(pack_width(x))),
                                  np.asarray(x))


def test_packed_conv_matches_unpacked_exactly():
    # 3x3 stride-1 conv with TORCH padding: packed output == unpacked
    # output, including the zero-padded borders.
    rng = np.random.default_rng(1)
    cin = cout = 6
    p = {
        "weight": jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)), jnp.float32
        ),
        "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, 7, 10, cin)), jnp.float32)
    want = np.asarray(conv_apply(p, x))
    got = np.asarray(
        unpack_width(conv_apply(pack_conv_dict_width(p), pack_width(x)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_quantized_conv_matches_unpacked_exactly():
    # int8: zero-point-0 keeps the structured zeros and the padding exact,
    # so packed and unpacked quantized convs agree bit-for-bit in the
    # integer domain (same dequant arithmetic -> allclose in float).
    from tpupose.models.quantize import quantize_convs

    rng = np.random.default_rng(2)
    cin = cout = 6
    p = {
        "weight": jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)), jnp.float32
        ),
        "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, 6, 8, cin)), jnp.float32)
    q = quantize_convs({"c": p}, {id(p): float(jnp.max(jnp.abs(x)))})["c"]
    want = np.asarray(conv_apply(q, x))
    got = np.asarray(
        unpack_width(conv_apply(pack_conv_dict_width(q), pack_width(x)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_hrnet_matches_unpacked():
    # Full tiny HRNet: branch-0-packed serving tree + pack_branch0 config
    # reproduces the plain forward (f32 compute to isolate the
    # reparameterization from bf16 rounding).
    import dataclasses

    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(3), cfg))
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.standard_normal((2, *cfg.input_size, 3)), jnp.float32
    )
    want = np.asarray(hrnet_apply(params, cfg, x, compute_dtype=jnp.float32))
    pp = pack_hrnet_branch0(params)
    pcfg = dataclasses.replace(cfg, pack_branch0=True)
    got = np.asarray(hrnet_apply(pp, pcfg, x, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_packed_hrnet_int8_matches_unpacked_int8():
    import dataclasses

    from tpupose.models.quantize import quantize_hrnet

    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(5), cfg))
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((2, *cfg.input_size, 3)), jnp.float32)
    qp = quantize_hrnet(params, cfg, x)
    want = np.asarray(hrnet_apply(qp, cfg, x, compute_dtype=jnp.float32))
    pqp = pack_hrnet_branch0(qp)
    pcfg = dataclasses.replace(cfg, pack_branch0=True)
    got = np.asarray(hrnet_apply(pqp, pcfg, x, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pipeline_pack_models_preserves_outputs():
    # Pipeline.pack_models: the serving switch must leave the fused frame
    # program's detections (and so everything downstream) unchanged.
    from tpupose.data.synthetic import make_scene
    from tpupose.geometry import make_camera_set
    from tpupose.models.yolov3 import tiny_yolo_test_config, yolov3_init
    from tpupose.pipeline.facade import Pipeline
    from tpupose.tracking.tracker import TrackerConfig

    scene = make_scene(num_frames=1, num_cameras=3, num_actors=2, seed=0)
    H, W = 96, 128
    rig = make_camera_set(scene.P, scene.K, scene.RT, W, H)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=3, max_dets=8, max_tracks=8, max_hyp=16)
    det_params = fold_batchnorm(yolov3_init(jax.random.PRNGKey(0), det_cfg))
    pose_params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(1), pose_cfg))
    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, size=(3, H, W, 3), dtype=np.uint8)

    pipe = Pipeline(cams=rig, tracker_cfg=tcfg, det_cfg=det_cfg,
                    det_params=det_params, pose_cfg=pose_cfg,
                    pose_params=pose_params)
    _, dets_a, mask_a = pipe.process_frame(0, images)

    pipe.track_restart()
    pipe.pack_models()
    assert pipe.pose_cfg.pack_branch0
    _, dets_b, mask_b = pipe.process_frame(0, images)
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
    np.testing.assert_allclose(
        np.asarray(dets_a), np.asarray(dets_b), atol=2e-2
    )
    pipe.pack_models()  # idempotent
    assert pipe.pose_cfg.pack_branch0


def test_packed_tree_is_jittable_and_shapes():
    import dataclasses

    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(7), cfg))
    pp = pack_hrnet_branch0(params)
    # branch-0 kernels doubled, other branches untouched
    w = pp["stage2"]["0"]["branches"]["0"]["0"]["conv1"]["weight"]
    assert w.shape == (3, 3, 2 * cfg.width, 2 * cfg.width)
    w1 = pp["stage2"]["0"]["branches"]["1"]["0"]["conv1"]["weight"]
    assert w1.shape[2] == 2 * cfg.width  # branch 1 has 2*width channels...
    assert w1.shape == (3, 3, 2 * cfg.width, 2 * cfg.width)  # ...unpacked
    pcfg = dataclasses.replace(cfg, pack_branch0=True)
    x = jnp.ones((1, *cfg.input_size, 3), jnp.float32)
    out = jax.jit(lambda b: hrnet_apply(pp, pcfg, b))(x)
    assert out.shape == (1, *cfg.heatmap_size, cfg.num_joints)
