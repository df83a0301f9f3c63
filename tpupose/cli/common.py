"""Shared CLI plumbing for testmodel / evalmodel.

Builds a Pipeline from a reference-format YAML config (same `--dataset`
selection as `src/testmodel.py:101-107` / `src/evalmodel.py:379-386`) and
runs the per-frame loop. Supports three backend modes:
  * real:      converted YOLO/HRNet checkpoints (paths from the YAML)
  * replay:    2D detections loaded from a pickle (re-scoring w/o models)
  * synthetic: the built-in synthetic scene (no dataset or weights needed)
"""
from __future__ import annotations

import os
import pickle
import sys
import time as _time

import numpy as np
import jax.numpy as jnp

from tpupose.data.config import Config, load_config, tracker_config_from
from tpupose.data.dataset import load_filenames, load_images
from tpupose.pipeline.facade import Pipeline
from tpupose.utils.timing import StageTimer


def build_pipeline_real(cfg: Config, camera_parameter, width, height,
                        bundle: str | None = None):
    cams = Pipeline.camera_set_from_parameter_dict(
        camera_parameter, width, height, num_cameras=len(cfg.dataset.folders_order)
    )
    tcfg = tracker_config_from(cfg, num_cameras=cams.num_cameras)
    det_cfg = yolo_config_from(cfg)
    pose_cfg = hrnet_config_from(cfg)
    if bundle:
        # Torch-free serving: pre-converted BN-folded bf16 orbax bundle
        # (written once by `python -m tpupose.cli.convert`); the manifest
        # is checked against the YAML-derived configs inside load_bundle.
        from tpupose.cli.convert import load_bundle

        det_params, pose_params = load_bundle(bundle, det_cfg, pose_cfg)
        return Pipeline(
            cams=cams, tracker_cfg=tcfg, det_cfg=det_cfg,
            det_params=det_params, pose_cfg=pose_cfg, pose_params=pose_params,
        )
    from tpupose.models.convert import load_darknet_weights, load_hrnet_torch_checkpoint
    from tpupose.models.layers import fold_batchnorm

    det_params, _ = load_darknet_weights(cfg.detect_model.weight, det_cfg)
    pose_params = load_hrnet_torch_checkpoint(cfg.pose_model.checkpoint_file)
    # Serve BN-folded bf16 params: exact for frozen statistics, halves param
    # HBM traffic, and satisfies `quantize_convs`' BN-folded contract so the
    # CLI --int8 path matches the documented perf+accuracy configuration
    # (docs/PERF.md; tpupose/models/quantize.py:99-110).
    det_params = fold_batchnorm(det_params, dtype=jnp.bfloat16)
    pose_params = fold_batchnorm(pose_params, dtype=jnp.bfloat16)
    return Pipeline(
        cams=cams, tracker_cfg=tcfg, det_cfg=det_cfg, det_params=det_params,
        pose_cfg=pose_cfg, pose_params=pose_params,
    )


def yolo_config_from(cfg: Config):
    from tpupose.models.yolov3 import YoloConfig

    d = cfg.detect_model
    return YoloConfig(
        score_thresh=d.score_thresh,
        nms_thresh=d.nms_thresh,
        width_mult=d.width_mult,
        num_classes=d.num_classes,
        input_size=d.input_size,
        max_candidates=d.max_candidates,
    )


def hrnet_config_from(cfg: Config):
    from tpupose.models.hrnet import HRNetConfig

    p = cfg.pose_model
    return HRNetConfig(
        width=p.c,
        num_joints=p.num_joints,
        input_size=tuple(p.resolution),
        stem_channels=p.stem_channels,
        layer1_blocks=p.layer1_blocks,
        layer1_planes=p.layer1_planes,
        stage_modules=tuple(p.stage_modules),
        stage_blocks=p.stage_blocks,
        decode_refine=p.decode_refine,
    )


def device_prefetch(frame_source, depth: int = 2):
    """Overlap host->device transfer with device compute.

    `jax.device_put` is asynchronous: issuing the NEXT frame's transfer
    before consuming the current one hides the per-transfer latency
    (~20 ms RTT through the dev relay — docs/PERF.md) behind the current
    frame's compute. Works for both image frames and replay detections.
    """
    import collections

    import jax

    def put(item):
        frame_id, timestamp, images, dets, mask = item
        if images is not None:
            images = jax.device_put(np.ascontiguousarray(images))
        if dets is not None:
            dets = jax.device_put(np.asarray(dets))
            mask = jax.device_put(np.asarray(mask))
        return frame_id, timestamp, images, dets, mask

    queue = collections.deque()
    for item in frame_source:
        queue.append(put(item))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def run_eval_loop(cfg: Config, pipe: Pipeline, frame_source, timer: StageTimer,
                  prefetch: bool = True, clip: int = 0):
    """Per-frame loop accumulating 3D predictions and 2D annotations.

    frame_source yields (frame_id, timestamp, images|None, dets|None, mask|None).

    clip > 1 buffers that many image frames and runs them through the
    two-stage clip pipeline (`Pipeline.process_clip`: batched NN + scanned
    tracker — the configuration the throughput benchmark times), falling
    back to per-frame processing for a trailing partial clip and for replay
    items. Results are identical to the per-frame path (pinned by
    tests/test_real_data_path.py::test_cli_clip_mode_matches_frame_mode).

    FrameOutputs stay on device during the loop and are harvested in one
    batched fetch at the end — host<->device syncs per frame are expensive
    (PERF.md), and nothing in the loop needs the outputs.
    """
    import jax

    if prefetch:
        # prefetch at least a clip ahead so the NN stage never starves
        frame_source = device_prefetch(frame_source, depth=max(2, clip))
    chunks = []  # FrameOutput pytrees with a leading frame axis
    keys = []
    frame_ids = []
    timestamps = []
    is_panoptic = cfg.dataset.test_dataset == "Panoptic"
    buf = []  # (frame_id, images) buffered for clip mode

    def flush_clip():
        if not buf:
            return
        if len(buf) == clip:
            fids = np.asarray([b[0] for b in buf], np.int32)
            imgs = jnp.stack([b[1] for b in buf])
            start = _time.perf_counter()
            outs, _, _ = pipe.process_clip(fids, imgs)
            timer.add("track", _time.perf_counter() - start,
                      count=len(buf))
            chunks.append(outs)
        else:  # trailing partial clip: per-frame (state evolution identical)
            for fid, images in buf:
                with timer.time("track"):
                    out, _, _ = pipe.process_frame(fid, images)
                chunks.append(jax.tree.map(lambda x: x[None], out))
        buf.clear()

    for frame_id, timestamp, images, dets, mask in frame_source:
        if images is not None and clip > 1:
            buf.append((frame_id, images))
            if len(buf) == clip:
                flush_clip()
        elif images is not None:
            with timer.time("track"):
                out, dets, mask = pipe.process_frame(frame_id, images)
            chunks.append(jax.tree.map(lambda x: x[None], out))
        else:
            flush_clip()  # keep frame order if sources are mixed
            with timer.time("track"):
                out = pipe.person_track(frame_id, jnp.asarray(dets), jnp.asarray(mask))
            chunks.append(jax.tree.map(lambda x: x[None], out))
        keys.append(timestamp if is_panoptic else frame_id)
        frame_ids.append(frame_id)
        timestamps.append(timestamp)
    flush_clip()

    multi_poses3d = {}
    annotations = []
    if not chunks:
        return multi_poses3d, annotations
    stacked = jax.tree.map(
        lambda *xs: np.asarray(jnp.concatenate(xs, axis=0)), *chunks
    )
    for i, key in enumerate(keys):
        out_i = jax.tree.map(lambda x: x[i], stacked)
        pts3d, ids, anns = pipe.harvest(
            out_i, frame_ids[i], timestamps[i] if is_panoptic else None
        )
        multi_poses3d[key] = pts3d
        annotations.extend(anns)
    return multi_poses3d, annotations


def dataset_frame_source(cfg: Config, use_native: bool = True,
                         timer: StageTimer | None = None,
                         prefetch: int = 4):
    """Frames from disk; decodes through the C++ prefetching FrameLoader
    (worker threads decode ahead, overlapping host I/O with device compute —
    `tpupose/runtime/loader.cc`) when the files are JPEGs and the native
    runtime is available, with a sequential PIL fallback otherwise.

    When `timer` is given, the host-thread time spent BLOCKED waiting for
    the next decoded frame is recorded as the `decode_wait` stage. On the
    FrameLoader path this is the decode-ahead pool's stall signature: after
    warmup it should be ~0 s/frame when device dispatch keeps the workers
    ahead (asserted at full image size by
    `scripts/ingest_dress_rehearsal.py`). On the PIL fallback it is the
    full serial decode cost — the same cost the reference pays inside its
    timed loop (`src/dataset.py:36-45`)."""
    from tpupose.data.dataset import parse_timestamp

    datas = load_filenames(cfg.dataset)
    start, end = cfg.dataset.test_range
    frame_paths = datas[start:end]
    if not frame_paths:
        return

    is_jpeg = frame_paths[0][0].lower().endswith((".jpg", ".jpeg"))
    if use_native and is_jpeg:
        from tpupose.runtime import native

        if native.available():
            # prefetch must cover the consumer's BURST: clip mode pulls
            # `clip` frames back-to-back then idles on device dispatch, so
            # a buffer smaller than the clip forces inline decodes mid-
            # burst (measured 47 -> 7 ms/frame blocked at prefetch 4 -> 8
            # on a 1-core host, clip 8 — docs/PERF.md round 5). Capped at
            # 16 frames (~220 MB at 5x720p) to bound resident memory.
            loader = native.FrameLoader(
                frame_paths, prefetch=min(max(4, prefetch), 16), threads=2
            )
            it = iter(loader)
            debug_waits = os.environ.get("TPUPOSE_DEBUG_DECODE_WAIT")
            try:
                for frame_id, paths in zip(range(start, end), frame_paths):
                    t0 = _time.perf_counter()
                    images = next(it)
                    wait = _time.perf_counter() - t0
                    if debug_waits:
                        print(f"decode_wait[{frame_id}] {wait * 1e3:.1f} ms",
                              file=sys.stderr, flush=True)
                    if timer is not None:
                        timer.add("decode_wait", wait)
                    timestamp = parse_timestamp(
                        cfg.dataset.test_dataset, paths[0]
                    )
                    yield frame_id, timestamp, images, None, None
            finally:
                stats = loader.stats()
                if debug_waits:
                    print(f"loader stats: {stats}", file=sys.stderr,
                          flush=True)
                if timer is not None and stats["frames_decoded"]:
                    # Workers' ACTUAL decode wall time (vs decode_wait =
                    # consumer blocked). In-situ decode far above the
                    # quiet-host serial cost means the core was contended
                    # while decoding — CPU famine, not pool serialization
                    # (scripts/ingest_dress_rehearsal.py uses the ratio to
                    # self-diagnose saturated hosts).
                    timer.add("decode_work", stats["decode_s"],
                              count=int(stats["frames_decoded"]))
                loader.close()
            return

    for frame_id in range(start, end):
        t0 = _time.perf_counter()
        images, timestamp = load_images(cfg.dataset.test_dataset, datas[frame_id])
        images = np.stack(images)
        if timer is not None:
            timer.add("decode_wait", _time.perf_counter() - t0)
        yield frame_id, timestamp, images, None, None


def synthetic_frame_source(num_frames=60, num_cameras=5, num_actors=3,
                           max_dets=16, noise_px=1.0, drop_prob=0.1, seed=0):
    """Frames from the built-in synthetic scene, replay-mode (no NN)."""
    from tpupose.data.synthetic import make_scene

    scene = make_scene(
        num_frames=num_frames, num_cameras=num_cameras, num_actors=num_actors,
        noise_px=noise_px, drop_prob=drop_prob, seed=seed,
    )

    def gen():
        for t in range(scene.num_frames):
            dets = np.zeros((num_cameras, max_dets, 17, 3), np.float32)
            mask = np.zeros((num_cameras, max_dets), bool)
            for c, d in enumerate(scene.detections_list(t)):
                dets[c, : len(d)] = d
                mask[c, : len(d)] = True
            yield t, t, None, dets, mask

    return scene, gen()


def result_path(cfg: Config):
    store_dir = os.path.join(cfg.output, cfg.dataset.test_dataset, "logs")
    name = "{}_{}_{}_{}.pkl".format(
        cfg.pipeline.detect_model,
        cfg.pipeline.pose_model,
        cfg.pipeline.person_matcher,
        cfg.dataset.root.rstrip("/").split("/")[-1],
    )
    return os.path.join(store_dir, name)


def load_camera_parameter(cfg: Config):
    path = os.path.join(cfg.dataset.root, cfg.dataset.calibration_file)
    with open(path, "rb") as f:
        return pickle.load(f)
