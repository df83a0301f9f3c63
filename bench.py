"""Benchmark: end-to-end multi-view frames/sec on one TPU chip.

Measures the two-stage clip pipeline of the flagship configuration and
composes the per-frame cost of both stages:

  stage A (NN): YOLOv3@416 person detection + HRNet-W48@384x288 top-down
    pose for a whole 32-frame clip as one big batch (160 images, 640
    crops), random BN-folded bf16 weights on random frames — FLOPs and
    memory traffic are identical to converted checkpoints;
  stage B (tracker): the jitted multi-view tracker scanned over the clip,
    driven by REALISTIC detections from the adversarial synthetic scene
    (crossing actors, occlusion, noise) — the tracker's cost is
    data-dependent (association/init workload), so random-frame garbage
    detections would understate it.

  fps = clip_frames / (t_A + t_B), the same serialization the fused
  production program has.

Measurement hygiene (docs/PERF.md): the axon relay costs 15-18 ms per
dispatch, ~0.24 GB/s per host->device upload, and ~100 ms for an EAGER op
on a clip-sized array — so the timed loops must touch only device-resident
pre-staged inputs (distinct per iteration, so the relay's execute-request
cache cannot fake the numbers) and dispatch asynchronously with a single
scalar fetch at the end.

Baseline context (BASELINE.md): the reference publishes no fps; the TPU
target is >=300 multi-view frames/sec on a v5e-8 at reference accuracy,
i.e. 37.5 frames/sec/chip. vs_baseline = measured_fps / 37.5.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"};
the stage breakdown goes to stderr.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: repeat runs skip the multi-minute compile
    # (does not engage through the dev relay, but costs nothing).
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from tpupose.data.synthetic import make_adversarial_scene, make_scene
    from tpupose.geometry import make_camera_set
    from tpupose.models.hrnet import hrnet_init, hrnet_w48_config
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.yolov3 import YoloConfig, yolov3_init
    from tpupose.pipeline.facade import Pipeline
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

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

    # Pre-stage n_clips DISTINCT clips on device as ONE batch (generated
    # there — no uploads; the timed program is a single dispatch scanning
    # all clips, the continuous-serving shape; per-dispatch relay overhead
    # of ~15-18 ms + ~0.1 ms/argument-leaf is a dev-tunnel artifact, not
    # chip throughput — docs/PERF.md).
    n_clips = 8
    gen_clips = jax.jit(
        lambda seed: jax.random.randint(
            jax.random.PRNGKey(seed),
            (n_clips, F, VIEWS, H, W, 3), 0, 255, jnp.uint8,
        )
    )
    clips = gen_clips(jnp.uint32(0))       # split-timing batch (stderr)
    clips2 = gen_clips(jnp.uint32(1))      # headline combined-timing batch
    clips_warm = gen_clips(jnp.uint32(2))  # warmup batch (distinct requests)
    float(jnp.sum(clips[0, 0, 0, 0, 0]))
    float(jnp.sum(clips2[0, 0, 0, 0, 0]))
    float(jnp.sum(clips_warm[0, 0, 0, 0, 0]))

    # Stage B inputs: adversarial-scene detections (crossing + occlusion +
    # noise) looped over the clip — a representative association/update/init
    # workload for the tracker.
    adv = make_adversarial_scene(num_frames=F, num_cameras=VIEWS,
                                 num_actors=3, noise_px=1.5, seed=1)
    dets = np.zeros((F, VIEWS, CROPS_PER_VIEW, 17, 3), np.float32)
    mask = np.zeros((F, VIEWS, CROPS_PER_VIEW), bool)
    for t in range(F):
        for c, d in enumerate(adv.detections_list(t)):
            n = min(len(d), CROPS_PER_VIEW)
            dets[t, c, :n] = d[:n]
            mask[t, c, :n] = True
    adv_cams = make_camera_set(adv.P, adv.K, adv.RT, adv.width, adv.height)
    dets = jnp.asarray(dets)
    mask = jnp.asarray(mask)

    # Stage B inputs for all clips: the adversarial detections looped
    # n_clips times = one 256-frame stream, tracked in one dispatch.
    dets_all = jnp.asarray(np.tile(np.asarray(dets), (n_clips, 1, 1, 1, 1)))
    mask_all = jnp.asarray(np.tile(np.asarray(mask), (n_clips, 1, 1)))
    fids_all = jax.device_put(np.arange(n_clips * F, dtype=np.int32))
    float(jnp.sum(fids_all))

    # Warmup / compile stage A (distinct inputs from the timed run).
    d0, m0 = pipe.process_clips_nn(clips_warm)
    float(jnp.sum(d0))

    # Stage A: ONE dispatch scanning all n_clips pre-staged clips.
    start = time.perf_counter()
    d_i, m_i = pipe.process_clips_nn(clips)
    float(jnp.sum(d_i))  # real value fetch = real sync through the relay
    t_nn = time.perf_counter() - start

    # Stage B: ONE dispatch tracking the full 256-frame stream.
    track_all_fn = jax.jit(
        lambda st, d, m, f: track_clip(tcfg, adv_cams, st, d, m, f)
    )
    fids_b = jax.device_put(np.arange(n_clips * F, dtype=np.int32)
                            + 10 * n_clips * F)
    float(jnp.sum(fids_b))
    st, outs = track_all_fn(
        init_state(tcfg), dets_all, mask_all, fids_b
    )  # warmup/compile at the 256-frame shape (distinct frame ids)
    float(jnp.sum(outs.pose3d))
    start = time.perf_counter()
    st, outs = track_all_fn(init_state(tcfg), dets_all, mask_all, fids_all)
    float(jnp.sum(outs.pose3d))
    t_track = time.perf_counter() - start

    # Headline: both stages dispatched back-to-back, ONE sync at the end
    # (a deployment never syncs between stages; each fetch above costs a
    # ~35 ms relay round-trip). Distinct inputs (clips2, fresh frame ids)
    # so no execute request repeats.
    fids_c = jax.device_put(np.arange(n_clips * F, dtype=np.int32)
                            + 20 * n_clips * F)
    float(jnp.sum(fids_c))
    start = time.perf_counter()
    d_c, m_c = pipe.process_clips_nn(clips2)
    st_c, outs_c = track_all_fn(init_state(tcfg), dets_all, mask_all, fids_c)
    float(jnp.sum(outs_c.pose3d) + jnp.sum(d_c))
    t_combined = time.perf_counter() - start

    fps = n_clips * F / t_combined
    import os
    import sys

    print(
        f"bf16: stage A (NN) {t_nn / n_clips * 1e3:8.1f} ms/clip, "
        f"stage B (tracker) {t_track / n_clips * 1e3:8.1f} ms/clip "
        f"-> {fps:.1f} fps",
        file=sys.stderr,
    )

    # int8 serving mode (PTQ, tpupose.models.quantize): same pipeline,
    # quantized backbones. BENCH_INT8=0 skips it (e.g. to bound compile
    # time); the headline reports the faster mode, labeled.
    fps_q = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        # free the bf16 split-timing batch: three staged batches plus the
        # int8 program's workspace exhaust the 16 GB HBM
        clips.delete()
        del d_i, m_i, d_c, m_c
        sample = np.random.default_rng(1).integers(
            0, 255, size=(8, H, W, 3), dtype=np.uint8
        )
        pipe.quantize_models(sample)
        d0, m0 = pipe.process_clips_nn(clips_warm)  # compile the int8 program
        float(jnp.sum(d0))
        del d0, m0
        fids_d = jax.device_put(np.arange(n_clips * F, dtype=np.int32)
                                + 30 * n_clips * F)
        float(jnp.sum(fids_d))
        start = time.perf_counter()
        d_q, m_q = pipe.process_clips_nn(clips2)
        st_q, outs_q = track_all_fn(
            init_state(tcfg), dets_all, mask_all, fids_d
        )
        float(jnp.sum(outs_q.pose3d) + jnp.sum(d_q))
        fps_q = n_clips * F / (time.perf_counter() - start)
        print(f"int8 combined -> {fps_q:.1f} fps", file=sys.stderr)

    per_chip_target = 300.0 / 8.0
    mode = "bf16"
    best = fps
    if fps_q is not None and fps_q > fps:
        mode, best = "int8 serving", fps_q
    print(
        json.dumps(
            {
                "metric": "multi-view frames/sec (5-view YOLOv3+HRNet-W48 "
                          f"+ tracker on adversarial detections, 1 chip, {mode})",
                "value": round(best, 3),
                "unit": "frames/sec",
                "vs_baseline": round(best / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
