"""Demo/timing entry point (reference `src/testmodel.py` equivalent).

    python -m tpupose.cli.testmodel --dataset CampusSeq1
    python -m tpupose.cli.testmodel --synthetic

Runs the per-frame loop, optionally writes 2D-skeleton overlay images, and
prints the reference-format timing report (detect s/f, pose s/f, track s/f,
fps, tracking fps — `src/testmodel.py:92-99`).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from tpupose.cli.common import (
    build_pipeline_real,
    dataset_frame_source,
    load_camera_parameter,
    synthetic_frame_source,
)
from tpupose.data.config import load_config
from tpupose.utils.timing import StageTimer
from tpupose.utils.viz import draw_skeleton_overlay


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="CampusSeq1")
    parser.add_argument("--config-dir", type=str, default="configs")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--save-images", action="store_true")
    parser.add_argument("--clip", type=int, default=32,
                        help="buffer N frames through the two-stage clip "
                             "pipeline (the benchmark's throughput shape, "
                             "on by default so the timing demo reports the "
                             "benched fast path — parity with evalmodel); "
                             "0 = per-frame")
    parser.add_argument("--int8", action="store_true",
                        help="int8 serving mode (calibrated on the first "
                             "frame's views; a decoded-keypoint self-check "
                             "vs bf16 escalates to distill-QAT if PTQ "
                             "drifts — see evalmodel --int8-on-drift)")
    parser.add_argument("--int8-on-drift", type=str, default="escalate",
                        choices=["escalate", "raise", "warn"],
                        help="what to do when the int8 self-check fails")
    parser.add_argument("--bundle", type=str, default=None,
                        help="pre-converted orbax serving bundle dir "
                             "(python -m tpupose.cli.convert)")
    args = parser.parse_args(argv)

    timer = StageTimer()
    if args.synthetic:
        _run_synthetic(args, timer)
        return

    cfg = load_config(
        os.path.join(args.config_dir, args.dataset, "model_configs.yaml")
    )
    camera_parameter = load_camera_parameter(cfg)
    source = dataset_frame_source(cfg, timer=timer)
    first = next(source)
    images0 = first[2]
    pipe = build_pipeline_real(cfg, camera_parameter, images0.shape[2],
                               images0.shape[1], bundle=args.bundle)
    if args.int8:
        pipe.quantize_models(images0, on_drift=args.int8_on_drift)
    out_dir = os.path.join(cfg.output, cfg.dataset.test_dataset, "Images")
    os.makedirs(out_dir, exist_ok=True)

    def frames():
        yield first
        yield from source

    def save_overlays(out, frame_id, timestamp, images):
        _, ids, anns = pipe.harvest(out, frame_id, timestamp)
        vis = {c: images[c].copy() for c in range(images.shape[0])}
        for ann in anns:
            vis[ann["cid"]] = draw_skeleton_overlay(
                vis[ann["cid"]], ann["pose"], ann["scores"], ann["pid"]
            )
        from PIL import Image

        for c, img in vis.items():
            Image.fromarray(img).save(
                os.path.join(out_dir, f"{timestamp}_cam{c}.jpg")
            )

    n = 0
    if args.clip > 1:
        import jax

        buf = []
        for item in frames():
            buf.append(item)
            if len(buf) < args.clip:
                continue
            fids = np.asarray([b[0] for b in buf], np.int32)
            with timer.time("track"):
                outs, _, _ = pipe.process_clip(
                    fids, np.stack([b[2] for b in buf])
                )
            timer.counts["track"] += len(buf) - 1  # report per-frame
            n += len(buf)
            if args.save_images and cfg.save_image:
                for t, (fid, ts, images, _, _) in enumerate(buf):
                    out_t = jax.tree.map(lambda x: x[t], outs)
                    save_overlays(out_t, fid, ts, images)
            buf.clear()
        trailing = buf
    else:
        trailing = frames()
    for frame_id, timestamp, images, _, _ in trailing:
        with timer.time("track"):
            out, dets, mask = pipe.process_frame(frame_id, images)
        n += 1
        if args.save_images and cfg.save_image:
            save_overlays(out, frame_id, timestamp, images)
    print(f"processed {n} frames")
    print(timer.report(num_views=len(cfg.dataset.folders_order)))


def _run_synthetic(args, timer):
    import jax
    import jax.numpy as jnp

    from tpupose.geometry import make_camera_set
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

    scene, source = synthetic_frame_source(num_frames=args.frames)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=scene.num_cameras)
    # Clip-scan path (same as evalmodel --synthetic): one transfer in, one
    # scan on device, one fetch out.
    all_dets, all_masks = [], []
    for _, _, _, dets, mask in source:
        all_dets.append(dets)
        all_masks.append(mask)
    F = len(all_dets)
    dets = jnp.asarray(np.stack(all_dets))
    masks = jnp.asarray(np.stack(all_masks))
    fids = jnp.arange(F, dtype=jnp.int32)
    clip_fn = jax.jit(lambda st, d, m, f: track_clip(tcfg, rig, st, d, m, f))
    state, outs = clip_fn(init_state(tcfg), dets, masks, fids)  # compile
    with timer.time("track"):
        state, outs = clip_fn(init_state(tcfg), dets, masks, fids)
        valid = np.asarray(outs.valid)
    timer.counts["track"] = F  # report per-frame
    print(f"confirmed track-frames: {int(valid.sum())}")
    print(timer.report(num_views=scene.num_cameras))


if __name__ == "__main__":
    main()
