"""Tiny-scale pins for the end-to-end PCP machinery (`tpupose/eval/e2e.py`).

The chip-scale evidence is `scripts/int8_e2e_pcp.py` (real W48/W32, trained
on-chip, distill-QAT int8 vs bf16 through the full tracker -> PCP — the
metric the reference publishes, `src/evalmodel.py:120-206`). These tests pin
the machinery itself on CPU:

  * the crop-box keypoint mapping is the exact inverse of the decode's box
    mapping (ops/heatmap.py:94-98);
  * rendered blob crops peak at the requested keypoint;
  * perfect decoded keypoints through the full jitted tracker score ~100
    PCP on the synthetic scene;
  * the multi-view chain absorbs the measured residual int8 outlier
    pattern (<5% of joints, 75 px argmax jumps in one view — docs/PERF.md
    round 3) with < 1 PCP point of damage: the claim VERDICT r3 asked to
    convert from prose to measurement, pinned here at the tracker level.
"""
import numpy as np

from tpupose.data.synthetic import make_scene
from tpupose.eval.e2e import (
    build_scene_crops,
    crop_boxes_for_scene,
    image_to_crop,
    pcp_through_tracker,
    render_blob_crop,
)
from tpupose.models.hrnet import tiny_test_config


def test_image_to_crop_inverts_decode_box_mapping():
    """decode_heatmaps maps heatmap peak p -> x0 + p/wh * (x1-x0); with
    p = kx * (wh/in_w) that is exactly image_to_crop's inverse."""
    cfg = tiny_test_config()
    in_h, in_w = cfg.input_size
    rng = np.random.default_rng(0)
    ebox = np.array([100.0, 50.0, 100.0 + 3 * in_w, 50.0 + 3 * in_h])
    kps_img = np.stack(
        [rng.uniform(ebox[0], ebox[2], 17), rng.uniform(ebox[1], ebox[3], 17)],
        axis=-1,
    )
    kc = image_to_crop(kps_img, ebox, in_h, in_w)
    # forward map (the decode's formula, in crop rather than heatmap units)
    back_x = ebox[0] + kc[:, 0] / in_w * (ebox[2] - ebox[0])
    back_y = ebox[1] + kc[:, 1] / in_h * (ebox[3] - ebox[1])
    np.testing.assert_allclose(back_x, kps_img[:, 0], rtol=1e-6)
    np.testing.assert_allclose(back_y, kps_img[:, 1], rtol=1e-6)


def test_crop_boxes_cover_all_joints_with_margin():
    cfg = tiny_test_config()
    scene = make_scene(num_frames=4, num_actors=2, noise_px=0.0)
    kps, eboxes = crop_boxes_for_scene(scene, cfg, margin_px=15.0)
    in_h, in_w = cfg.input_size
    # aspect fitted, never shrunk below the joint extent + margin
    ar = (eboxes[:, 3] - eboxes[:, 1]) / (eboxes[:, 2] - eboxes[:, 0])
    np.testing.assert_allclose(ar, in_h / in_w, rtol=1e-4)
    for i in range(kps.shape[0]):
        kc = image_to_crop(kps[i], eboxes[i], in_h, in_w)
        assert (kc[:, 0] >= 0).all() and (kc[:, 0] <= in_w).all()
        assert (kc[:, 1] >= 0).all() and (kc[:, 1] <= in_h).all()


def test_render_blob_crop_peaks_at_keypoints():
    """Projecting the crop onto one joint's color direction, the argmax
    lands within a pixel of that joint's requested position. Joints are
    placed on a spaced grid: the JOINT_COLORS are distinct but not
    orthogonal, so overlapping blobs can out-project each other — the
    property under test is peak placement, not color separability."""
    from tpupose.models.train import JOINT_COLORS

    h, w = 96, 64
    rng = np.random.default_rng(1)
    gx, gy = np.meshgrid(np.arange(4), np.arange(5))
    kps = np.stack(
        [8.0 + 15.0 * gx.ravel()[:17], 10.0 + 18.0 * gy.ravel()[:17]],
        axis=-1,
    ) + rng.uniform(-2, 2, (17, 2))
    img = render_blob_crop(kps, h, w)
    assert img.shape == (h, w, 3) and img.min() >= 0 and img.max() <= 1
    for j in (0, 5, 16):
        # at the blob center the pixel equals the joint's own color exactly
        # (base + 1.0 * (color - base)); nearest-color argmin finds it
        dist = np.linalg.norm(img - JOINT_COLORS[j] / 255.0, axis=-1)
        peak = np.unravel_index(np.argmin(dist), dist.shape)
        assert abs(peak[1] - kps[j, 0]) <= 1.5, (j, peak, kps[j])
        assert abs(peak[0] - kps[j, 1]) <= 1.5, (j, peak, kps[j])


def test_build_scene_crops_shapes():
    cfg = tiny_test_config()
    scene, crops, eboxes = build_scene_crops(cfg, num_frames=3, num_actors=2)
    n = 3 * scene.num_cameras * 2
    assert crops.shape == (n, *cfg.input_size, 3)
    assert eboxes.shape == (n, 4)
    assert crops.std() > 0.005  # blobs actually rendered


def test_decode_tree_matches_training_input_distribution():
    """`decode_tree` must feed crops to the backbone EXACTLY as the
    training/calibration forwards do (raw [0,1], no ImageNet
    normalization) — the round-4 chip run proved a silent skew here zeroes
    the whole PCP chain for every tree (docs/PERF.md round 4). Pinned by
    equality against the agreement lab's decode formula on the same raw
    crops (`scripts/int8_w48_agreement.py:207`)."""
    import jax.numpy as jnp

    from tpupose.eval.e2e import decode_tree
    from tpupose.models.hrnet import hrnet_apply, hrnet_init
    from tpupose.ops.heatmap import decode_heatmaps

    cfg = tiny_test_config()
    scene, crops, eboxes = build_scene_crops(cfg, num_frames=2, num_actors=1)
    import jax

    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    got = decode_tree(params, cfg, crops, eboxes, "quarter", batch=4)
    want = np.asarray(
        decode_heatmaps(
            hrnet_apply(params, cfg, jnp.asarray(crops)),
            jnp.asarray(eboxes), refine="quarter",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _perfect_kps(scene, score=10.0):
    T, C, A = scene.num_frames, scene.num_cameras, scene.num_actors
    kps = np.concatenate(
        [scene.gt2d, np.full((T, C, A, 17, 1), score)], axis=-1
    ).astype(np.float32)
    return kps.reshape(T * C * A, 17, 3)


def test_pcp_through_tracker_perfect_detections():
    scene = make_scene(num_frames=20, num_actors=2, noise_px=0.0)
    res = pcp_through_tracker(scene, _perfect_kps(scene))
    assert res["average"] * 100 >= 99.0, res["table"]


def test_multiview_chain_absorbs_int8_outlier_pattern():
    """The measured residual int8 error pattern (docs/PERF.md r3: <5% of
    keypoints argmax-jump, max 75 px, after distill-QAT) must be absorbed
    by the epipolar check + greedy view drop + triangulation — the prose
    claim VERDICT r3 asked to measure. Here: 5% of one camera's joints
    jump 75 px; the PCP cost must stay under 1 point."""
    scene = make_scene(num_frames=20, num_actors=2, noise_px=0.0)
    clean = pcp_through_tracker(scene, _perfect_kps(scene))

    T, C, A = scene.num_frames, scene.num_cameras, scene.num_actors
    kps = _perfect_kps(scene).reshape(T, C, A, 17, 3).copy()
    rng = np.random.default_rng(7)
    jump = rng.uniform(size=(T, A, 17)) < 0.05
    theta = rng.uniform(0, 2 * np.pi, size=(T, A, 17))
    kps[:, 0, ..., 0] += np.where(jump, 75 * np.cos(theta), 0.0)
    kps[:, 0, ..., 1] += np.where(jump, 75 * np.sin(theta), 0.0)
    assert jump.sum() > 0
    noisy = pcp_through_tracker(scene, kps.reshape(T * C * A, 17, 3))

    delta = (clean["average"] - noisy["average"]) * 100
    assert delta < 1.0, (
        f"outlier pattern cost {delta:.2f} PCP points "
        f"(clean {clean['average'] * 100:.2f}, "
        f"noisy {noisy['average'] * 100:.2f})"
    )
