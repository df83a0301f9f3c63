"""Near-tie association churn vs `tie_eps` (VERDICT r4 next-round #4).

The f64 oracle mints ~half the jitted f32 tracker's ids on the
1,000-frame adversarial soak because competing association pairs whose
affinities differ by less than f32 rounding noise are resolved by that
noise — randomly per frame. `TrackerConfig.tie_eps` adds a deterministic
bias (hash(track_id) x det-position key) to positive-affinity pairs
before the assignment solve so near-ties resolve stably.

This sweep runs the soak stream (identical to tests/test_tracker_soak.py:
5 cams, 3 actors, noise 1.0 px, occlusion, shuffle, seed 7) through BOTH
trackers at several tie_eps values and reports:
  minted ids (jit / oracle), the per-checkpoint |jit - oracle| band,
  and jit MOTA / IDF1 / id-switches vs GT.

CPU-runnable (forces the CPU backend). ~2 min per eps value (one scan
compile each).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tie_churn_sweep.py \
         [--eps 0,3e-4,1e-3,3e-3] [--frames 1000]
"""
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from tpupose.data.synthetic import make_continuous_adversarial_scene
    from tpupose.eval.mot import evaluate_mot
    from tpupose.geometry import make_camera_set
    from tpupose.tracking.oracle import OracleTracker, TrackerParams, _Cameras
    from tpupose.tracking.tracker import TrackerConfig, init_state, track_clip

    def argval(flag, default):
        if flag in sys.argv:
            return sys.argv[sys.argv.index(flag) + 1]
        return default

    FRAMES = int(argval("--frames", 1000))
    CHUNK = 100
    eps_list = [float(e) for e in
                argval("--eps", "0,3e-4,1e-3,3e-3").split(",")]

    scene = make_continuous_adversarial_scene(
        num_frames=FRAMES, num_cameras=5, num_actors=3, noise_px=1.0,
        occlusion_px=60.0, shuffle=True, seed=7,
    )
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    cams_np = _Cameras(
        np.asarray(rig.P), np.asarray(rig.F), np.asarray(rig.rk_inv),
        np.asarray(rig.center),
    )
    base = dict(num_cameras=5, max_dets=8, max_tracks=12, max_hyp=24)

    dets = np.zeros((FRAMES, 5, 8, 17, 3), np.float32)
    mask = np.zeros((FRAMES, 5, 8), bool)
    for t in range(FRAMES):
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), 8)
            dets[t, c, :n] = d[:n]
            mask[t, c, :n] = True
    gt = [
        {a: scene.gt3d[t, a] for a in range(scene.num_actors)}
        for t in range(FRAMES)
    ]

    print(f"{'tie_eps':>8} | {'jit ids':>7} {'orc ids':>7} {'band':>5} | "
          f"{'MOTA':>6} {'IDF1':>6} {'IDsw':>4}")
    for eps in eps_list:
        cfg = TrackerConfig(**base, tie_eps=eps)
        oracle = OracleTracker(cams_np, TrackerParams(tie_eps=eps))
        clip_fn = jax.jit(
            lambda st, d, m, f, _cfg=cfg: track_clip(_cfg, rig, st, d, m, f)
        )
        state = init_state(cfg)
        outs_all = []
        band = 0
        for start in range(0, FRAMES, CHUNK):
            end = start + CHUNK
            state, outs = clip_fn(
                state, jnp.asarray(dets[start:end]),
                jnp.asarray(mask[start:end]),
                jnp.arange(start, end, dtype=jnp.int32),
            )
            outs_all.append(jax.tree.map(np.asarray, outs))
            for t in range(start, end):
                oracle.step(t, scene.detections_list(t))
            band = max(band,
                       abs(int(np.asarray(state.next_id)) - oracle.next_id))
        valid = np.concatenate([o.valid for o in outs_all])
        tids = np.concatenate([o.track_id for o in outs_all])
        poses = np.concatenate([o.pose3d for o in outs_all])
        pred = [
            {int(tids[t, s]): poses[t, s] for s in np.flatnonzero(valid[t])}
            for t in range(FRAMES)
        ]
        m = evaluate_mot(gt, pred)
        print(f"{eps:>8g} | {int(np.asarray(state.next_id)):>7} "
              f"{oracle.next_id:>7} {band:>5} | {m['mota']:>6.3f} "
              f"{m['idf1']:>6.3f} {m['id_switches']:>4}", flush=True)


if __name__ == "__main__":
    main()
