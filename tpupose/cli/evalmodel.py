"""Evaluation entry point (reference `src/evalmodel.py` equivalent).

    python -m tpupose.cli.evalmodel --dataset CampusSeq1
    python -m tpupose.cli.evalmodel --synthetic          # no data/weights

Same YAML configs (`configs/<ds>/model_configs.yaml`), same artifacts
(predictions pkl + per-camera 2D JSON), same PCP / Panoptic score tables.
"""
from __future__ import annotations

import argparse
import os

from tpupose.cli.common import (
    build_pipeline_real,
    dataset_frame_source,
    load_camera_parameter,
    result_path,
    run_eval_loop,
    synthetic_frame_source,
)
from tpupose.data.config import load_config, tracker_config_from
from tpupose.eval import (
    evaluate_panoptic_from_pickle,
    evaluate_pcp_from_pickle,
    write_2d_result,
    write_3d_result,
)
from tpupose.utils.timing import StageTimer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="CampusSeq1",
                        help="CampusSeq1, Shelf, Panoptic")
    parser.add_argument("--config-dir", type=str, default="configs")
    parser.add_argument("--synthetic", action="store_true",
                        help="run on the built-in synthetic scene (replay mode)")
    parser.add_argument("--replay", type=str, default=None,
                        help="cached 2D detections dump pickle (reference "
                             "dump format); skips the NN backends")
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--clip", type=int, default=32,
                        help="buffer N frames and run them through the "
                             "two-stage clip pipeline (batched NN + scanned "
                             "tracker) — the benchmark's throughput shape, "
                             "on by default so the entry point delivers the "
                             "benched fps; trailing partial clips (and runs "
                             "shorter than N) fall back to the per-frame "
                             "path with identical results; 0 = per-frame")
    parser.add_argument("--int8", action="store_true",
                        help="int8 serving mode: post-training-quantize the "
                             "backbones (tpupose.models.quantize)")
    parser.add_argument("--int8-calib", type=int, default=8,
                        help="number of leading frames whose views feed the "
                             "--int8 activation-scale calibration pass AND "
                             "the post-quantize drift self-check (default 8: "
                             "calibrating + checking on a single frame can "
                             "pass on an unrepresentative sample — "
                             "scripts/calib_size_drift.py measures drift vs "
                             "set size; <8 prints a warning)")
    parser.add_argument("--qat-steps", type=int, default=0,
                        help="with --int8: label-free QAT — fine-tune each "
                             "backbone for N straight-through steps to match "
                             "its own float outputs on the calibration "
                             "frames before requantizing (distill_qat); "
                             "0 = PTQ first, auto-escalating to QAT only if "
                             "the built-in int8-vs-bf16 self-check fails "
                             "(see --int8-on-drift)")
    parser.add_argument("--int8-on-drift", type=str, default="escalate",
                        choices=["escalate", "raise", "warn"],
                        help="when the post-quantize self-check (decoded "
                             "keypoints int8 vs bf16 on the calibration "
                             "frames) exceeds the drift gate: escalate = "
                             "auto-upgrade to distill-QAT (900 steps, the "
                             "remedy measured at W48 scale) and re-check; "
                             "raise = refuse to serve; warn = print and "
                             "continue with the drifted trees")
    parser.add_argument("--bundle", type=str, default=None,
                        help="pre-converted orbax serving bundle dir "
                             "(python -m tpupose.cli.convert); serving then "
                             "needs neither torch nor the original "
                             "checkpoint files")
    args = parser.parse_args(argv)

    timer = StageTimer()
    if args.synthetic:
        _run_synthetic(args, timer)
        return

    cfg = load_config(
        os.path.join(args.config_dir, args.dataset, "model_configs.yaml")
    )
    camera_parameter = load_camera_parameter(cfg)

    if args.replay:
        from tpupose.data.config import tracker_config_from
        from tpupose.data.replay import load_detection_dump, replay_frame_source
        from tpupose.pipeline.facade import Pipeline

        width, height = _probe_image_size(cfg)
        cams = Pipeline.camera_set_from_parameter_dict(
            camera_parameter, width, height,
            num_cameras=len(cfg.dataset.folders_order),
        )
        tcfg = tracker_config_from(cfg, num_cameras=cams.num_cameras)
        pipe = Pipeline(cams=cams, tracker_cfg=tcfg)
        source = replay_frame_source(
            cfg, load_detection_dump(args.replay), tcfg.max_dets,
            tcfg.num_joints,
        )
        image_hw = (height, width)
    else:
        import numpy as np

        source = dataset_frame_source(cfg, timer=timer,
                                      prefetch=max(4, args.clip))
        # peek first frame for image size
        first = next(source)
        images0 = first[2]
        pipe = build_pipeline_real(
            cfg, camera_parameter, images0.shape[2], images0.shape[1],
            bundle=args.bundle,
        )
        head = [first]
        bundle_quantized = False
        if args.bundle:
            from tpupose.cli.convert import read_manifest

            bundle_quantized = bool(read_manifest(args.bundle).get("quantized"))
            if bundle_quantized and args.int8:
                print("note: bundle is already int8-quantized (calibrated "
                      "at convert time); skipping in-process calibration")
        if args.int8 and not bundle_quantized:
            # calibrate activation scales on the first --int8-calib frames'
            # views (all consumed frames are replayed into the eval loop)
            while len(head) < max(args.int8_calib, 1):
                try:
                    head.append(next(source))
                except StopIteration:
                    break
            print(f"--int8: calibrating + self-checking on frames "
                  f"{[int(item[0]) for item in head]}")
            pipe.quantize_models(
                np.concatenate([item[2] for item in head], axis=0),
                qat_steps=args.qat_steps,
                on_drift=args.int8_on_drift,
            )
        image_hw = (images0.shape[1], images0.shape[2])

        def chained(head=head, source=source):
            yield from head
            yield from source

        source = chained()

    multi_poses3d, annotations = run_eval_loop(
        cfg, pipe, source, timer, clip=args.clip
    )

    pkl = result_path(cfg)
    write_3d_result(multi_poses3d, pkl)
    write_2d_result(
        image_hw, annotations,
        save_dir=os.path.join(cfg.output, cfg.dataset.test_dataset, "TrackResult"),
    )
    if cfg.dataset.test_dataset == "Panoptic":
        evaluate_panoptic_from_pickle(pkl, cfg.dataset.root)
    else:
        res = evaluate_pcp_from_pickle(
            cfg.dataset.eval_range, pkl, cfg.dataset.root, cfg.dataset.test_dataset
        )
        print(res["table"])
        print(f"Average PCP: {res['average'] * 100:.2f}")
    print(timer.report(num_views=len(cfg.dataset.folders_order)))


def _probe_image_size(cfg):
    """Image (width, height) from the first frame on disk.

    A replay run legitimately may have NO images at all (cached-detections
    datasets) — that case falls back to 1280x720 with a notice. But a
    dataset that HAS image files which cannot be read is a broken dataset:
    silently substituting a default resolution would hand the tracker
    wrong-scale cameras, so that fails loudly instead."""
    from tpupose.data.dataset import load_filenames, load_images

    try:
        datas = load_filenames(cfg.dataset)
    except Exception:
        datas = []
    if not datas or not datas[0]:
        print("note: no dataset images found (replay without frames); "
              "assuming 1280x720 for the camera rig")
        return 1280, 720
    # Images exist on disk -> they must be readable.
    images, _ = load_images(cfg.dataset.test_dataset, datas[0])
    return images[0].shape[1], images[0].shape[0]


def _run_synthetic(args, timer):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpupose.eval import coco2shelf3d, evaluate_pcp
    from tpupose.geometry import make_camera_set
    from tpupose.pipeline.facade import Pipeline
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

    scene, source = synthetic_frame_source(num_frames=args.frames)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=scene.num_cameras)
    pipe = Pipeline(cams=rig, tracker_cfg=tcfg)

    # Replay-mode clip path: all detections transfer once, the tracker scans
    # the clip on-device, outputs fetch once (PERF.md: per-frame syncs are
    # ~25 ms each through the dev tunnel).
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
        outs_np = jax.tree.map(np.asarray, outs)
    timer.counts["track"] = F  # report per-frame
    multi_poses3d, annotations = {}, []
    for t in range(F):
        out_t = jax.tree.map(lambda x: x[t], outs_np)
        pts3d, ids, anns = pipe.harvest(out_t, t)
        multi_poses3d[t] = pts3d
        annotations.extend(anns)
    actors_gt = [
        [coco2shelf3d(scene.gt3d[t, a].T) for t in range(scene.num_frames)]
        for a in range(scene.num_actors)
    ]
    res = evaluate_pcp([[5, scene.num_frames]], multi_poses3d, actors_gt)
    print(res["table"])
    print(f"Average PCP: {res['average'] * 100:.2f}")
    print(timer.report(num_views=scene.num_cameras))


if __name__ == "__main__":
    main()
