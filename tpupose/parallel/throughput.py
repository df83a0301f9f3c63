"""Multi-stream throughput pipeline (BASELINE.json config 5).

Runs S independent camera systems (e.g. Campus + Shelf + Panoptic
concurrently, or many copies of one) through the two-stage clip pipeline:
stage A batches the NN over ALL streams and frames at once (S*F*C images,
S*F*C*K crops — the bigger the batch, the better the TPU per-op
amortization), stage B vmaps the tracker scan over streams. With a mesh, the
stream axis shards over 'data' so each chip detects/poses/tracks its own
subset; there is no cross-chip traffic in the hot loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupose.geometry import CameraSet
from tpupose.models.hrnet import HRNetConfig, hrnet_apply, normalize_image
from tpupose.models.yolov3 import YoloConfig, detect_people
from tpupose.ops.heatmap import decode_heatmaps_auto, expand_box_to_aspect
from tpupose.ops.image import crop_and_resize, resize_bilinear
from tpupose.tracking.tracker import TrackerConfig, tracker_step


def make_multistream_clip_fn(det_cfg: YoloConfig, pose_cfg: HRNetConfig,
                             tcfg: TrackerConfig, image_hw):
    """Build the jitted multi-stream clip function.

    Returns fn(det_params, pose_params, cams_s, states_s, clip, frame_ids)
    where cams_s / states_s have a leading stream axis, clip is
    (S, F, C, H, W, 3) uint8 and frame_ids is (S, F).
    """
    in_h, in_w = pose_cfg.input_size
    H, W = image_hw

    @partial(jax.jit, donate_argnums=(3,))
    def fn(det_params, pose_params, cams_s, states_s, clip, frame_ids):
        s, f, c, h, w, _ = clip.shape
        x = clip.reshape(s * f * c, h, w, 3).astype(jnp.float32) / 255.0
        size = det_cfg.input_size
        ximg = resize_bilinear(x, (size, size))
        boxes, scores, valid = detect_people(det_params, det_cfg, ximg, (h, w))
        k = boxes.shape[1]
        eboxes = expand_box_to_aspect(boxes.reshape(-1, 4), in_h / in_w)
        crops = jax.vmap(
            lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
        )(x * 255.0, eboxes.reshape(s * f * c, k, 4))
        crops = normalize_image(crops.reshape(s * f * c * k, in_h, in_w, 3))
        heat = hrnet_apply(pose_params, pose_cfg, crops)
        kps = decode_heatmaps_auto(heat, eboxes)
        kps = kps.reshape(s, f, c, k, pose_cfg.num_joints, 3)
        valid = valid.reshape(s, f, c, k)
        d = tcfg.max_dets
        if k >= d:
            dets, mask = kps[:, :, :, :d], valid[:, :, :, :d]
        else:
            dets = jnp.zeros((s, f, c, d, tcfg.num_joints, 3)).at[
                :, :, :, :k
            ].set(kps)
            mask = jnp.zeros((s, f, c, d), bool).at[:, :, :, :k].set(valid)

        def one_stream(cams, state, dets_s, mask_s, fids_s):
            def body(st, xs):
                dd, mm, fid = xs
                st, out = tracker_step(tcfg, cams, st, dd, mm, fid)
                return st, out

            return jax.lax.scan(body, state, (dets_s, mask_s, fids_s))

        new_states, outs = jax.vmap(one_stream)(
            cams_s, states_s, dets, mask, frame_ids
        )
        return new_states, outs

    return fn
