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
    parser.add_argument("--frames", type=int, default=120)
    args = parser.parse_args(argv)

    timer = StageTimer()
    if args.synthetic:
        _run_synthetic(args, timer)
        return

    cfg = load_config(
        os.path.join(args.config_dir, args.dataset, "model_configs.yaml")
    )
    camera_parameter = load_camera_parameter(cfg)
    source = dataset_frame_source(cfg)
    # peek first frame for image size
    first = next(source)
    images0 = first[2]
    pipe = build_pipeline_real(cfg, camera_parameter, images0.shape[2], images0.shape[1])

    def chained():
        yield first
        yield from source

    multi_poses3d, annotations = run_eval_loop(cfg, pipe, chained(), timer)

    pkl = result_path(cfg)
    write_3d_result(multi_poses3d, pkl)
    write_2d_result(
        (images0.shape[1], images0.shape[2]), annotations,
        save_dir=os.path.join(cfg.output, cfg.dataset.test_dataset, "TrackResult"),
    )
    if cfg.dataset.test_dataset == "Panoptic":
        evaluate_panoptic_from_pickle(pkl, cfg.dataset.root)
    else:
        res = evaluate_pcp_from_pickle(
            cfg.dataset.eval_range, pkl, cfg.dataset.root, cfg.dataset.test_dataset
        )
        print(res["table"])
    print(timer.report(num_views=len(cfg.dataset.folders_order)))


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
