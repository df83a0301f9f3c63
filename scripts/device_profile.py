"""Honest per-stage DEVICE timing: chain R reps of each stage inside ONE
jitted program (lax.scan with a data dependency between reps), so relay
artifacts (15-18 ms/dispatch, 0.24 GB/s upload, eager-op overhead — see
docs/PERF.md) cannot pollute the numbers. Each stage's per-rep time =
(t(program with R reps) - t(program with 1 rep)) / (R - 1), which cancels
the fixed dispatch + input-materialization cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/device_profile.py
"""
from __future__ import annotations

import time

import numpy as np

REPS = 8
F, C, H, W = 32, 5, 720, 1280
K = 4


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.data.synthetic import make_adversarial_scene
    from tpupose.geometry import make_camera_set
    from tpupose.models.hrnet import (
        hrnet_apply,
        hrnet_init,
        hrnet_w48_config,
        normalize_image,
    )
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.yolov3 import (
        YoloConfig,
        detect_people,
        prepare_yolo_images,
        yolov3_init,
    )
    from tpupose.ops.heatmap import decode_heatmaps, expand_box_to_aspect
    from tpupose.ops.image import crop_and_resize
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

    det_cfg = YoloConfig(max_candidates=K)
    pose_cfg = hrnet_w48_config()
    tcfg = TrackerConfig(num_cameras=C, max_dets=K, max_tracks=12, max_hyp=24)
    det_params = fold_batchnorm(
        yolov3_init(jax.random.PRNGKey(0), det_cfg), dtype=jnp.bfloat16
    )
    pose_params = fold_batchnorm(
        hrnet_init(jax.random.PRNGKey(1), pose_cfg), dtype=jnp.bfloat16
    )

    def timed_scan(name, make_input, step, reps):
        """Build scan(step) over `reps` iterations inside one jit; return
        wall time. The carry perturbation keeps reps serially dependent."""

        @jax.jit
        def prog(seed):
            x0 = make_input(seed)

            def body(x, _):
                return step(x), None

            xr, _ = jax.lax.scan(body, x0, None, length=reps)
            return jax.tree.map(
                lambda v: jnp.sum(v.astype(jnp.float32)), jax.tree.leaves(xr)[0]
            )

        out = prog(jnp.uint32(0))  # compile + warmup
        float(out)
        t0 = time.perf_counter()
        out = prog(jnp.uint32(1))
        float(out)
        return time.perf_counter() - t0

    def stage(name, make_input, step):
        t1 = timed_scan(name, make_input, step, 1)
        tr = timed_scan(name, make_input, step, REPS)
        per = (tr - t1) / (REPS - 1)
        print(f"{name:34s} {per * 1e3:9.2f} ms/clip-stage "
              f"{per * 1e3 / F:8.3f} ms/frame", flush=True)
        return per

    results = {}

    # ---- preprocess + YOLO: uint8 frames -> boxes ----
    def mk_frames(seed):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (F * C, H, W, 3), 0, 255, jnp.uint8
        )

    def step_pre_yolo(u8):
        x = u8.astype(jnp.float32) / 255.0
        ximg = prepare_yolo_images(det_cfg, x)
        boxes, scores, valid = detect_people(det_params, det_cfg, ximg, (H, W))
        # fold detection output back into the carry to chain reps
        bump = (jnp.sum(boxes) * 0).astype(jnp.uint8)
        return u8 + bump + jnp.uint8(1)

    results["preprocess+yolo(160)"] = stage(
        "preprocess+yolo(160)", mk_frames, step_pre_yolo
    )

    # ---- crop + normalize (640 crops) ----
    rng = np.random.default_rng(0)
    boxes_h = np.zeros((F * C, K, 4), np.float32)
    boxes_h[..., 0] = rng.uniform(0, W / 2, boxes_h.shape[:2])
    boxes_h[..., 1] = rng.uniform(0, H / 2, boxes_h.shape[:2])
    boxes_h[..., 2] = boxes_h[..., 0] + rng.uniform(80, 300, boxes_h.shape[:2])
    boxes_h[..., 3] = boxes_h[..., 1] + rng.uniform(100, 350, boxes_h.shape[:2])
    boxes_d = jnp.asarray(boxes_h)
    in_h, in_w = pose_cfg.input_size

    def step_crop(u8):
        x = u8.astype(jnp.float32)
        eboxes = expand_box_to_aspect(boxes_d.reshape(-1, 4), in_h / in_w)
        crops = jax.vmap(
            lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
        )(x, eboxes.reshape(F * C, K, 4))
        crops = normalize_image(crops.reshape(F * C * K, in_h, in_w, 3))
        bump = (jnp.sum(crops) * 0).astype(jnp.uint8)
        return u8 + bump + jnp.uint8(1)

    results["crop+normalize(640)"] = stage("crop+normalize(640)", mk_frames, step_crop)

    # ---- HRNet forward (640 crops) ----
    def mk_crops(seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (F * C * K, in_h, in_w, 3), jnp.bfloat16
        )

    def step_hrnet(x):
        heat = hrnet_apply(pose_params, pose_cfg, x)
        return x + jnp.mean(heat).astype(jnp.bfloat16) * 0

    results["hrnet-w48(640)"] = stage("hrnet-w48(640)", mk_crops, step_hrnet)

    # ---- heatmap decode (640) ----
    hh, wh = pose_cfg.heatmap_size
    eboxes_d = jnp.asarray(
        expand_box_to_aspect(boxes_h.reshape(-1, 4), in_h / in_w)
    )

    def mk_heat(seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (F * C * K, hh, wh, 17), jnp.float32
        )

    def step_decode(h):
        kps = decode_heatmaps(h, eboxes_d)
        return h + jnp.mean(kps) * 0 + 1e-3

    results["decode(640)"] = stage("decode(640)", mk_heat, step_decode)

    # ---- tracker scan (32 frames) ----
    adv = make_adversarial_scene(num_frames=F, num_cameras=C, num_actors=3,
                                 noise_px=1.5, seed=1)
    dets = np.zeros((F, C, K, 17, 3), np.float32)
    mask = np.zeros((F, C, K), bool)
    for t in range(F):
        for c, d in enumerate(adv.detections_list(t)):
            n = min(len(d), K)
            dets[t, c, :n] = d[:n]
            mask[t, c, :n] = True
    adv_cams = make_camera_set(adv.P, adv.K, adv.RT, adv.width, adv.height)
    dets_d, mask_d = jnp.asarray(dets), jnp.asarray(mask)

    def mk_track(seed):
        return (init_state(tcfg), seed.astype(jnp.int32))

    def step_track(carry):
        st, base = carry
        st, outs = track_clip(tcfg, adv_cams, st, dets_d, mask_d,
                              jnp.arange(F, dtype=jnp.int32) + base * F)
        return (st, base + 1)

    results["track(32f)"] = stage("track(32f)", mk_track, step_track)

    total = sum(results.values())
    print(f"{'DEVICE TOTAL':34s} {total * 1e3:9.2f} ms/clip "
          f"{total * 1e3 / F:8.3f} ms/frame -> {F / total:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
