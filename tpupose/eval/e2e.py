"""End-to-end accuracy machinery: synthetic scene -> model-input crops ->
decoded keypoints -> full jitted tracker -> PCP.

The reference's accuracy contract is 3D PCP after triangulation
(`src/evalmodel.py:120-206`), not 2D keypoint agreement. This module builds
the evidence chain between a 2D pose backbone (bf16 or int8) and that
metric without any real dataset: a synthetic multi-camera scene with known
GT, crops rendered at the projected GT keypoints in the blob-localization
style the on-chip-trained models were fitted on
(`tpupose/models/train.py::blob_localization_batch`), and the production
tracker + PCP scorer downstream.

Used by `scripts/int8_e2e_pcp.py` (chip-scale: real W48/W32) and pinned at
tiny scale by `tests/test_int8_e2e_pcp.py`.
"""
from __future__ import annotations

import numpy as np


def render_blob_crop(kps_crop, h, w, blob_sigma=2.5):
    """One blob crop, same rendering as `blob_localization_batch`
    (`tpupose/models/train.py`): base 0.35, per-joint distinct-colored
    Gaussian, clip to [0, 1]. Local 5-sigma windows (tail truncation
    exp(-12.5) ~ 4e-6) keep hundreds of crop renders fast."""
    from tpupose.models.train import JOINT_COLORS

    img = np.full((h, w, 3), 0.35, np.float32)
    r = int(np.ceil(5 * blob_sigma))
    for j in range(kps_crop.shape[0]):
        x, y = float(kps_crop[j, 0]), float(kps_crop[j, 1])
        x0, x1 = max(0, int(x) - r), min(w, int(x) + r + 1)
        y0, y1 = max(0, int(y) - r), min(h, int(y) + r + 1)
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        blob = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * blob_sigma**2))
        color = JOINT_COLORS[j % len(JOINT_COLORS)]
        img[y0:y1, x0:x1] += blob[..., None] * (color / 255.0 - 0.35)
    return np.clip(img, 0, 1)


def crop_boxes_for_scene(scene, cfg, margin_px=15.0):
    """Aspect-fitted crop boxes around every (frame, camera, actor)'s GT
    projection. Returns (kps (T*C*A, 17, 2) image px, eboxes (T*C*A, 4)),
    index order t-major, then camera, then actor."""
    import jax.numpy as jnp

    from tpupose.ops.heatmap import expand_box_to_aspect

    in_h, in_w = cfg.input_size
    T, C, A = scene.num_frames, scene.num_cameras, scene.num_actors
    kps = scene.gt2d.reshape(T * C * A, 17, 2)
    lo = kps.min(axis=1) - margin_px
    hi = kps.max(axis=1) + margin_px
    boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    eboxes = np.asarray(expand_box_to_aspect(jnp.asarray(boxes), in_h / in_w))
    return kps, eboxes


def image_to_crop(kps_img, ebox, in_h, in_w):
    """Map (J, 2) image-space keypoints into crop pixel coordinates — the
    inverse of `decode_heatmaps`' box mapping (ops/heatmap.py:94-98)."""
    x0, y0, x1, y1 = ebox
    return np.stack(
        [
            (kps_img[:, 0] - x0) * in_w / (x1 - x0),
            (kps_img[:, 1] - y0) * in_h / (y1 - y0),
        ],
        axis=-1,
    )


def build_scene_crops(cfg, num_frames=40, num_actors=2, margin_px=15.0,
                      seed=0, scene=None):
    """Synthetic scene + rendered model-input crops.

    Returns (scene, crops (T*C*A, H, W, 3) float32 in [0,1],
    eboxes (T*C*A, 4) image-space crop boxes)."""
    from tpupose.data.synthetic import make_scene

    if scene is None:
        scene = make_scene(num_frames=num_frames, num_actors=num_actors,
                           noise_px=0.0, seed=seed)
    in_h, in_w = cfg.input_size
    kps, eboxes = crop_boxes_for_scene(scene, cfg, margin_px=margin_px)
    crops = np.zeros((kps.shape[0], in_h, in_w, 3), np.float32)
    for i in range(kps.shape[0]):
        kc = image_to_crop(kps[i], eboxes[i], in_h, in_w)
        crops[i] = render_blob_crop(kc, in_h, in_w)
    return scene, crops, eboxes


def decode_tree(params, cfg, crops, eboxes, refine, batch=16, fetch=None):
    """hrnet forward + decode over fixed-size batches (one compile);
    returns (N, 17, 3) keypoints in image coordinates. `fetch` optionally
    wraps each dispatch (e.g. the agreement lab's tunnel-outage retry)."""
    import jax
    import jax.numpy as jnp

    from tpupose.models.hrnet import hrnet_apply
    from tpupose.ops.heatmap import decode_heatmaps

    fetch = fetch or (lambda fn, *a: np.asarray(fn(*a)))
    n = crops.shape[0]
    pad = (-n) % batch
    crops_p = np.concatenate([crops, crops[:pad]], axis=0)
    eb_p = np.concatenate([eboxes, eboxes[:pad]], axis=0)

    @jax.jit
    def run(p, x, eb):
        # raw [0,1] crops, NO ImageNet normalization: the blob-trained
        # models (scripts/int8_w48_agreement.py::learned_w48), their BN
        # recalibration, and the int8 calibration forwards all consume the
        # rendered crops as-is — decode must see the same distribution.
        # (Round-4 chip run with normalize_image here scored PCP 0.00 for
        # every tree: a train/serve input-distribution skew, not a model
        # failure. Real-image serving normalizes in the facade instead.)
        heat = hrnet_apply(p, cfg, jnp.asarray(x))
        return decode_heatmaps(heat, jnp.asarray(eb), refine=refine)

    outs = []
    for i in range(0, crops_p.shape[0], batch):
        outs.append(fetch(run, params, crops_p[i:i + batch],
                          eb_p[i:i + batch]))
    return np.concatenate(outs, axis=0)[:n]


def pcp_through_tracker(scene, kps_img, score_scale=10.0, warmup=5):
    """Decoded keypoints -> full jitted tracker -> per-frame 3D -> PCP.

    Mirrors `cli/evalmodel._run_synthetic`'s replay loop: all detections
    transfer once, `track_clip` scans on-device, PCP scored like the
    reference (`src/evalmodel.py:120-206`). Heatmap peak scores (~10 for
    blob-trained models: the training targets are x10-scaled) are mapped
    to ~[0, 1] via `score_scale`."""
    import jax
    import jax.numpy as jnp

    from tpupose.eval import coco2shelf3d, evaluate_pcp
    from tpupose.geometry import make_camera_set
    from tpupose.pipeline.facade import Pipeline
    from tpupose.tracking.tracker import (
        TrackerConfig,
        init_state,
        track_clip,
    )

    T, C, A = scene.num_frames, scene.num_cameras, scene.num_actors
    kps = np.asarray(kps_img, np.float32).reshape(T, C, A, 17, 3).copy()
    kps[..., 2] = np.clip(kps[..., 2] / score_scale, 0.0, 1.0)

    tcfg = TrackerConfig(num_cameras=C)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    pipe = Pipeline(cams=rig, tracker_cfg=tcfg)
    dets = np.zeros((T, C, tcfg.max_dets, 17, 3), np.float32)
    mask = np.zeros((T, C, tcfg.max_dets), bool)
    dets[:, :, :A] = kps
    mask[:, :, :A] = True

    clip_fn = jax.jit(lambda st, d, m, f: track_clip(tcfg, rig, st, d, m, f))
    state, outs = clip_fn(
        init_state(tcfg), jnp.asarray(dets), jnp.asarray(mask),
        jnp.arange(T, dtype=jnp.int32),
    )
    outs_np = jax.tree.map(np.asarray, outs)
    multi_poses3d = {}
    for t in range(T):
        out_t = jax.tree.map(lambda x: x[t], outs_np)
        pts3d, _, _ = pipe.harvest(out_t, t)
        multi_poses3d[t] = pts3d
    actors_gt = [
        [coco2shelf3d(scene.gt3d[t, a].T) for t in range(T)]
        for a in range(A)
    ]
    return evaluate_pcp([[warmup, T]], multi_poses3d, actors_gt,
                        num_report_actors=A)
