"""Benchmark: end-to-end multi-view frames/sec on one TPU chip.

Measures the two-stage clip pipeline of the flagship configuration —
stage A: YOLOv3@416 person detection + HRNet-W48@384x288 top-down pose for a
whole 16-frame clip as one big batch (80 images, 320 crops); stage B: the
jitted multi-view tracker scanned over the clip — on synthetic frames
(random weights, BN-folded bf16; FLOPs and memory traffic are identical to
converted checkpoints).

Baseline context (BASELINE.md): the reference publishes no fps; the TPU
target is >=300 multi-view frames/sec on a v5e-8 at reference accuracy,
i.e. 37.5 frames/sec/chip. vs_baseline = measured_fps / 37.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the clip program is large (F*C images,
    # F*C*K crops in one XLA program); repeat runs skip the multi-minute
    # compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from tpupose.data.synthetic import make_scene
    from tpupose.geometry import make_camera_set
    from tpupose.models.hrnet import hrnet_init, hrnet_w48_config
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.yolov3 import YoloConfig, yolov3_init
    from tpupose.pipeline.facade import Pipeline
    from tpupose.tracking.tracker import TrackerConfig

    VIEWS = 5
    CROPS_PER_VIEW = 4  # 5 views x 4 people = 20 crops/frame
    H, W = 720, 1280
    F = 32  # clip length

    det_cfg = YoloConfig(max_candidates=CROPS_PER_VIEW)
    pose_cfg = hrnet_w48_config()
    tcfg = TrackerConfig(num_cameras=VIEWS, max_dets=CROPS_PER_VIEW,
                         max_tracks=12, max_hyp=24)

    det_params = fold_batchnorm(
        yolov3_init(jax.random.PRNGKey(0), det_cfg), dtype=jnp.bfloat16
    )
    pose_params = fold_batchnorm(
        hrnet_init(jax.random.PRNGKey(1), pose_cfg), dtype=jnp.bfloat16
    )

    scene = make_scene(num_frames=1, num_cameras=VIEWS, num_actors=3, seed=0)
    cams = make_camera_set(scene.P, scene.K, scene.RT, W, H)
    pipe = Pipeline(
        cams=cams, tracker_cfg=tcfg, det_cfg=det_cfg, det_params=det_params,
        pose_cfg=pose_cfg, pose_params=pose_params,
    )

    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.integers(0, 255, size=(F, VIEWS, H, W, 3), dtype=np.uint8)
    )
    frame_ids = jnp.arange(F, dtype=jnp.int32)

    # Warmup / compile.
    outs, _, _ = pipe.process_clip(frame_ids, clip)
    jax.block_until_ready(outs.pose3d)

    n_clips = 8
    start = time.perf_counter()
    for i in range(1, n_clips + 1):
        outs, _, _ = pipe.process_clip(frame_ids + F * i, clip)
    # Force a real value fetch (block_until_ready can be a no-op through the
    # dev tunnel's async relay).
    float(jnp.sum(outs.pose3d))
    elapsed = time.perf_counter() - start
    fps = n_clips * F / elapsed

    per_chip_target = 300.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "multi-view frames/sec (5-view YOLOv3+HRNet-W48+track, 1 chip)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
