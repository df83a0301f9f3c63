"""Per-stage timing via separate dispatched programs — RELAY-POLLUTED.

DEPRECATED for per-stage truth: each loop iteration pays ~15-18 ms of
relay dispatch overhead plus eager-op costs, which swamps the smaller
stages and inflates HRNet ~5x (docs/PERF.md, round 2). Use
`scripts/device_profile.py` (in-jit scan chaining) for honest device
numbers; this script remains useful only to measure the per-dispatch
overhead itself.

Times each pipeline stage as its own jitted program at the bench shapes
(F=32 frames, 5 views, 720p, 4 crops/view):
  image:  uint8 -> f32, resize to 416 (YOLO input) for 160 images
  yolo:   YOLOv3@416 forward + decode + NMS on 160 images
  crop:   crop_and_resize + normalize for 640 crops
  hrnet:  HRNet-W48@384x288 forward on 640 crops
  decode: heatmap -> keypoints for 640 crops
  track:  32-frame tracker scan on adversarial-scene detections

Prints one line per stage: total ms per clip and ms/frame. Input varies per
iteration (relay caches identical execute requests — docs/PERF.md).
"""
from __future__ import annotations

import time

import numpy as np


def bench_fn(fn, args, n=5, vary=None):
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    sync(fn(*args))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        a = vary(args, i) if vary else args
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from tpupose.data.synthetic import make_adversarial_scene
    from tpupose.geometry import make_camera_set
    from tpupose.models.hrnet import hrnet_init, hrnet_w48_config, hrnet_apply, normalize_image
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.yolov3 import YoloConfig, yolov3_init, detect_people
    from tpupose.ops.heatmap import decode_heatmaps, expand_box_to_aspect
    from tpupose.ops.image import crop_and_resize, resize_bilinear
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

    F, C, H, W = 32, 5, 720, 1280
    K = 4
    det_cfg = YoloConfig(max_candidates=K)
    pose_cfg = hrnet_w48_config()
    tcfg = TrackerConfig(num_cameras=C, max_dets=K, max_tracks=12, max_hyp=24)
    det_params = fold_batchnorm(yolov3_init(jax.random.PRNGKey(0), det_cfg),
                                dtype=jnp.bfloat16)
    pose_params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(1), pose_cfg),
                                 dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(F * C, H, W, 3), dtype=np.uint8))

    results = {}

    @jax.jit
    def stage_image(u8):
        x = u8.astype(jnp.float32) / 255.0
        return resize_bilinear(x, (det_cfg.input_size, det_cfg.input_size))

    def record(name, t):
        results[name] = t
        print(f"{name:28s} {t * 1e3:10.2f} ms/clip", flush=True)

    t = bench_fn(stage_image, (imgs,), vary=lambda a, i: (a[0] + np.uint8(i),))
    record("image(resize416 x160)", t)

    ximg = stage_image(imgs)

    @jax.jit
    def stage_yolo(x):
        return detect_people(det_params, det_cfg, x, (H, W))

    t = bench_fn(stage_yolo, (ximg,),
                 vary=lambda a, i: (a[0] + np.float32(i) * 1e-6,))
    record("yolo(160 imgs)", t)

    boxes, scores, valid = stage_yolo(ximg)

    @jax.jit
    def stage_crop(u8, boxes):
        x = u8.astype(jnp.float32) / 255.0
        in_h, in_w = pose_cfg.input_size
        eboxes = expand_box_to_aspect(boxes.reshape(-1, 4), in_h / in_w)
        crops = jax.vmap(
            lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
        )(x * 255.0, eboxes.reshape(F * C, K, 4))
        return normalize_image(crops.reshape(F * C * K, in_h, in_w, 3)), eboxes

    t = bench_fn(stage_crop, (imgs, boxes),
                 vary=lambda a, i: (a[0] + np.uint8(i), a[1]))
    record("crop(640)", t)

    crops, eboxes = stage_crop(imgs, boxes)

    @jax.jit
    def stage_hrnet(x):
        return hrnet_apply(pose_params, pose_cfg, x)

    t = bench_fn(stage_hrnet, (crops,),
                 vary=lambda a, i: (a[0] + np.float32(i) * 1e-6,))
    record("hrnet(640 crops)", t)

    heat = stage_hrnet(crops)

    @jax.jit
    def stage_decode(h, eb):
        return decode_heatmaps(h, eb)

    t = bench_fn(stage_decode, (heat, eboxes),
                 vary=lambda a, i: (a[0] + np.float32(i) * 1e-6, a[1]))
    record("decode(640)", t)

    adv = make_adversarial_scene(num_frames=F, num_cameras=C, num_actors=3,
                                 noise_px=1.5, seed=1)
    dets = np.zeros((F, C, K, 17, 3), np.float32)
    mask = np.zeros((F, C, K), bool)
    for tt in range(F):
        for c, d in enumerate(adv.detections_list(tt)):
            n = min(len(d), K)
            dets[tt, c, :n] = d[:n]
            mask[tt, c, :n] = True
    adv_cams = make_camera_set(adv.P, adv.K, adv.RT, adv.width, adv.height)
    dets = jnp.asarray(dets)
    mask = jnp.asarray(mask)
    track_fn = jax.jit(lambda st, d, m, f: track_clip(tcfg, adv_cams, st, d, m, f))
    state = init_state(tcfg)

    def vary_track(a, i):
        return (a[0], a[1], a[2], a[3] + F * i)

    t = bench_fn(track_fn, (state, dets, mask, jnp.arange(F, dtype=jnp.int32)),
                 vary=vary_track)
    record("track(32f scan)", t)

    total = sum(results.values())
    print(f"{'stage':28s} {'ms/clip':>10s} {'ms/frame':>10s} {'share':>7s}")
    for k, v in results.items():
        print(f"{k:28s} {v * 1e3:10.2f} {v * 1e3 / F:10.3f} {v / total:6.1%}")
    print(f"{'TOTAL':28s} {total * 1e3:10.2f} {total * 1e3 / F:10.3f}")
    print(f"composed fps: {F / total:.2f}")


if __name__ == "__main__":
    main()
