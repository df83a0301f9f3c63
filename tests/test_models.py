"""Model tests: HRNet/YOLO shapes & invariants, heatmap decode, NMS,
crop/resize, checkpoint converter round-trips. (No pretrained weights are
available in this environment; numerical parity with released checkpoints is
exercised via structure/shape equality and synthetic round-trips.)"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.models.convert import (
    darknet_array_to_params,
    torch_state_dict_to_tree,
    tree_to_torch_state_dict,
)
from tpupose.models.hrnet import (
    hrnet_apply,
    hrnet_init,
    hrnet_w48_config,
    normalize_image,
    tiny_test_config,
)
from tpupose.models.yolov3 import (
    YoloConfig,
    conv_in_channels,
    decode_detections,
    detect_people,
    tiny_yolo_test_config,
    yolov3_apply,
    yolov3_init,
)
from tpupose.ops.heatmap import decode_heatmaps, expand_box_to_aspect
from tpupose.ops.image import crop_and_resize
from tpupose.ops.nms import iou_matrix, nms


def test_hrnet_tiny_forward_shapes():
    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.input_size[0], cfg.input_size[1], 3))
    heat = jax.jit(lambda p, x: hrnet_apply(p, cfg, x, jnp.float32))(params, x)
    assert heat.shape == (2, cfg.input_size[0] // 4, cfg.input_size[1] // 4,
                          cfg.num_joints)
    assert np.isfinite(np.asarray(heat)).all()


def test_hrnet_w48_param_count():
    # pose_hrnet_w48 has ~63.6M params; the tree should land in that range,
    # confirming the topology matches the official architecture.
    cfg = hrnet_w48_config()
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 60e6 < n < 68e6, f"param count {n / 1e6:.1f}M"


def test_hrnet_torch_roundtrip():
    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(1), cfg)
    sd = tree_to_torch_state_dict(params)
    # All keys look like torch pose_hrnet names.
    assert "conv1.weight" in sd
    assert any(k.startswith("stage2.0.fuse_layers.0.1.") for k in sd)
    assert any(k.startswith("layer1.0.conv1") for k in sd)
    back = torch_state_dict_to_tree(sd)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_yolo_tiny_forward_and_decode():
    cfg = tiny_yolo_test_config()
    params = yolov3_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3))
    heads = jax.jit(lambda p, x: yolov3_apply(p, cfg, x, jnp.float32))(params, x)
    s = cfg.input_size
    assert heads[0].shape[1:3] == (s // 32, s // 32)
    assert heads[1].shape[1:3] == (s // 16, s // 16)
    assert heads[2].shape[1:3] == (s // 8, s // 8)
    boxes, scores = decode_detections(cfg, heads)
    total = 3 * ((s // 32) ** 2 + (s // 16) ** 2 + (s // 8) ** 2)
    assert boxes.shape == (1, total, 4)
    assert scores.shape == (1, total)
    # Box centers must lie inside the input frame.
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    assert float(jnp.min(cx)) >= 0 and float(jnp.max(cx)) <= s


def test_yolo_darknet_converter_roundtrip():
    cfg = tiny_yolo_test_config()
    specs = cfg.conv_specs
    cins = conv_in_channels(cfg)
    rng = np.random.default_rng(0)
    blobs = []
    for (cout, k, s, bn), cin in zip(specs, cins):
        if bn:
            blobs += [rng.normal(size=cout) for _ in range(4)]
        else:
            blobs.append(rng.normal(size=cout))
        blobs.append(rng.normal(size=cout * cin * k * k))
    data = np.concatenate([b.ravel() for b in blobs]).astype(np.float32)
    params = darknet_array_to_params(data, cfg)
    ref = yolov3_init(jax.random.PRNGKey(0), cfg)
    # identical tree structure and shapes
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        assert a.shape == b.shape
    # spot-check the very first BN beta and conv kernel values
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["bn"]["bias"]), blobs[0], rtol=1e-6
    )
    # forward runs
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3))
    yolov3_apply(params, cfg, x, jnp.float32)


def test_nms_suppresses_overlaps():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [0, 0, 0, 0]],
        jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.95])
    valid = jnp.array([True, True, True, False])
    keep = np.asarray(nms(boxes, scores, valid, 0.4))
    assert keep.tolist() == [True, False, True, False]


def test_iou_matrix_values():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 25, 25]], jnp.float32)
    iou = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 50 / 150, 0.0], atol=1e-6)


def test_detect_people_end_to_end_synthetic():
    # Plant a synthetic "detection" by constructing head outputs directly:
    # verify thresholding + NMS + coordinate scaling.
    cfg = tiny_yolo_test_config()
    s = cfg.input_size
    heads = [
        jnp.full((1, s // 32, s // 32, 3 * (5 + cfg.num_classes)), -10.0),
        jnp.full((1, s // 16, s // 16, 3 * (5 + cfg.num_classes)), -10.0),
        jnp.full((1, s // 8, s // 8, 3 * (5 + cfg.num_classes)), -10.0),
    ]
    # one strong person at grid cell (1, 1) of the stride-32 head, anchor 0
    h0 = heads[0].reshape(1, s // 32, s // 32, 3, 5 + cfg.num_classes)
    h0 = h0.at[0, 1, 1, 0, :].set(
        jnp.array([0.0, 0.0, 0.0, 0.0, 10.0, 10.0, -10.0])
    )
    heads[0] = h0.reshape(1, s // 32, s // 32, -1)
    boxes, scores = decode_detections(cfg, heads)
    k = int(jnp.argmax(scores[0]))
    assert float(scores[0, k]) > 0.99
    bx = (boxes[0, k, 0] + boxes[0, k, 2]) / 2
    assert abs(float(bx) - 1.5 * 32) < 1e-3  # sigmoid(0)+cx = 1.5 cells


def test_decode_heatmaps_peak_and_refinement():
    heat = np.zeros((1, 16, 12, 2), np.float32)
    heat[0, 8, 5, 0] = 1.0
    heat[0, 8, 6, 0] = 0.5  # right neighbor stronger -> +0.25 px
    heat[0, 3, 2, 1] = 1.0
    boxes = jnp.array([[10.0, 20.0, 10 + 24.0, 20 + 32.0]])  # w=24, h=32
    kp = np.asarray(decode_heatmaps(jnp.asarray(heat), boxes))
    # joint 0: px=5.25/12*24+10, py=8/16*32+20 (no y gradient)
    np.testing.assert_allclose(kp[0, 0, 0], 10 + 5.25 / 12 * 24, atol=1e-5)
    np.testing.assert_allclose(kp[0, 0, 1], 20 + 8.0 / 16 * 32, atol=1e-5)
    np.testing.assert_allclose(kp[0, 0, 2], 1.0)
    np.testing.assert_allclose(kp[0, 1, 0], 10 + 2.0 / 12 * 24, atol=1e-5)


def test_decode_heatmaps_parabolic_recovers_subpixel_center():
    # A Gaussian peak at a known SUB-CELL center: the parabolic vertex
    # refinement must recover it far more tightly than the sign-based
    # quarter shift, and must be tie-robust (a perfectly centered peak
    # has near-equal neighbors; the vertex stays ~0 where the quarter
    # shift flips ±0.25 on any epsilon perturbation).
    hh, wh = 24, 18
    yy, xx = np.mgrid[0:hh, 0:wh].astype(np.float32)
    boxes = jnp.array([[0.0, 0.0, float(wh), float(hh)]])  # 1 cell = 1 px

    def gauss(cy, cx, sigma=1.75):
        return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))

    centers = [(8.3, 5.7), (12.0, 9.0), (15.82, 3.26)]
    heat = np.stack([gauss(cy, cx) for cy, cx in centers], axis=-1)[None]
    kq = np.asarray(decode_heatmaps(jnp.asarray(heat), boxes))
    kp = np.asarray(
        decode_heatmaps(jnp.asarray(heat), boxes, refine="parabolic")
    )
    truth = np.array([[cx + 0.5, cy + 0.5] for cy, cx in centers])
    # decode maps cell i to (i+?)/size*box: cell centers sit at i/size —
    # compare in cell units against the continuous center
    err_par = np.linalg.norm(kp[0, :, :2] - np.array(
        [[cx, cy] for cy, cx in centers]), axis=-1)
    err_qtr = np.linalg.norm(kq[0, :, :2] - np.array(
        [[cx, cy] for cy, cx in centers]), axis=-1)
    assert err_par.max() < 0.15, (err_par, truth)
    assert err_par.mean() <= err_qtr.mean() + 1e-6, (err_par, err_qtr)

    # tie robustness: perturb the centered peak by one bf16-scale epsilon;
    # quarter flips a half-cell (0.25 - (-0.25)), parabolic moves ~epsilon
    base = gauss(12.0, 9.0)[None, :, :, None]
    eps = np.zeros_like(base)
    eps[0, 12, 10, 0] = 4e-3
    d_par, d_qtr = [], []
    for sgn in (+1.0, -1.0):
        h = jnp.asarray(base + sgn * eps)
        d_par.append(
            float(decode_heatmaps(h, boxes, refine="parabolic")[0, 0, 0])
        )
        d_qtr.append(float(decode_heatmaps(h, boxes)[0, 0, 0]))
    assert abs(d_par[0] - d_par[1]) < 0.02
    assert abs(d_qtr[0] - d_qtr[1]) == 0.5  # the documented tie flip


def test_expand_box_to_aspect():
    boxes = jnp.array([[0.0, 0.0, 30.0, 20.0]])  # too wide for 4/3
    out = np.asarray(expand_box_to_aspect(boxes, 4 / 3))[0]
    w, h = out[2] - out[0], out[3] - out[1]
    assert np.isclose(h / w, 4 / 3)
    assert w >= 30 and h >= 20
    # centered
    assert np.isclose((out[0] + out[2]) / 2, 15)


def test_crop_and_resize_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    box = jnp.array([[0.0, 0.0, 48.0, 32.0]])
    out = np.asarray(crop_and_resize(jnp.asarray(img), box, (32, 48)))[0]
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_and_resize_scales():
    # A constant-gradient image stays a gradient at any crop/zoom.
    h, w = 40, 40
    img = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, 1))
    box = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    out = np.asarray(crop_and_resize(jnp.asarray(img), box, (10, 10)))[0, :, :, 0]
    diffs = np.diff(out, axis=1)
    assert np.allclose(diffs, diffs[0, 0], atol=1e-4)
    assert 10 <= out[0, 0] <= 12


def test_normalize_image():
    x = jnp.full((2, 2, 3), 255.0)
    out = np.asarray(normalize_image(x))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_letterbox_resize_geometry_and_box_mapping():
    from tpupose.models.yolov3 import yolo_box_mapping
    from tpupose.ops.image import letterbox_resize

    # 2:1 wide image: letterbox to 64 -> content rows [16, 48), fill elsewhere.
    img = jnp.ones((40, 80, 3), jnp.float32)
    out = np.asarray(letterbox_resize(img, 64, fill=0.5))
    assert out.shape == (64, 64, 3)
    assert np.allclose(out[:16], 0.5) and np.allclose(out[48:], 0.5)
    assert np.allclose(out[16:48, :, :], 1.0, atol=1e-5)

    cfg = tiny_yolo_test_config()
    cfg = dataclasses.replace(cfg, letterbox=True, input_size=64)
    scale, offset = (np.asarray(a) for a in yolo_box_mapping(cfg, (40, 80)))
    # a box spanning the full content area maps back to the full image
    box_in = np.array([0.0, 16.0, 64.0, 48.0])
    orig = (box_in - offset) * scale
    np.testing.assert_allclose(orig, [0, 0, 80, 40], atol=1e-6)

    # plain mode: pure scaling, zero offset
    cfg_plain = dataclasses.replace(cfg, letterbox=False)
    scale, offset = (np.asarray(a) for a in yolo_box_mapping(cfg_plain, (40, 80)))
    np.testing.assert_allclose(offset, 0)
    np.testing.assert_allclose(scale, [80 / 64, 40 / 64] * 2)


def test_prepare_yolo_images_dispatch():
    from tpupose.models.yolov3 import prepare_yolo_images

    cfg = tiny_yolo_test_config()
    x = jnp.ones((2, 40, 80, 3), jnp.float32) * 0.25
    plain = np.asarray(prepare_yolo_images(cfg, x))
    assert plain.shape == (2, cfg.input_size, cfg.input_size, 3)
    assert np.allclose(plain, 0.25, atol=1e-5)  # plain resize of a constant
    lb = np.asarray(
        prepare_yolo_images(dataclasses.replace(cfg, letterbox=True), x)
    )
    assert np.allclose(lb[:, 0], 0.5)  # letterbox fill at the top
