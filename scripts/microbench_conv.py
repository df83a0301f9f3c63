"""Conv-shape microbenchmarks — superseded by relay_probe2/device_profile.

HISTORICAL: the per-op loops here are relay-dispatch-bound (a 3.38 ms
conv "measures" 236 ms — docs/PERF.md round 2). Kept for the record; use
in-jit chained timing (`scripts/relay_probe2.py` pattern) instead.

Quantifies WHERE HRNet-W48's MXU utilization goes: each row times one conv
shape (or a small fused group) and reports achieved TFLOP/s plus the implied
HBM traffic at the measured time. Hypotheses probed:

  * lane padding: NHWC activations with C=48 pad the minor dim to 128 on
    TPU (2.67x HBM bytes); C=96 pads to 128 (1.33x). If branch-1/2 convs
    come out bandwidth-bound at ~2.7x/1.3x their logical bytes, layout
    padding is the bottleneck — the fix is channel-packed custom layouts
    (Pallas fused blocks), not more MXU work.
  * space-to-depth: the same branch-1 block computed at (H/2, W/2, 4C)
    with a dense reparameterized 3x3 conv costs 4x the FLOPs but 1/2 the
    padded bytes — worth it only if the padding hypothesis holds strongly.
  * basic-block fusion: conv+relu+conv+add+relu as one jit — measures how
    much XLA already fuses (epilogue elementwise is free or not).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_conv.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    def timeit(fn, args, n=5, vary_idx=0):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            a = list(args)
            # vary by +i (NOT +i*1e-6: that rounds to a no-op in bf16 and
            # the relay caches identical execute requests)
            a[vary_idx] = a[vary_idx] + jnp.asarray(i, a[vary_idx].dtype)
            out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n

    def conv(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    PEAK = 197e12  # v5e bf16 FLOP/s
    BW = 819e9     # v5e HBM bytes/s

    def report(name, t, flops, logical_bytes):
        tf = flops / t / 1e12
        gbs = logical_bytes / t / 1e9
        print(f"{name:44s} {t*1e3:8.2f} ms  {tf:6.1f} TF/s ({flops/PEAK/t:5.1%})"
              f"  implied {gbs:6.0f} GB/s of logical bytes", flush=True)

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    N = 640
    cases = [
        # (name, H, W, Cin, Cout)
        ("b1 3x3 (96,72,48->48)", 96, 72, 48, 48),
        ("b2 3x3 (48,36,96->96)", 48, 36, 96, 96),
        ("b3 3x3 (24,18,192->192)", 24, 18, 192, 192),
        ("b4 3x3 (12,9,384->384)", 12, 9, 384, 384),
        ("b1 s2d-dense 3x3 (48,36,192->192)", 48, 36, 192, 192),
        ("b1-like c128 (96,72,128->128)", 96, 72, 128, 128),
    ]
    for name, h, w, ci, co in cases:
        x = mk((N, h, w, ci))
        wts = mk((3, 3, ci, co))
        f = jax.jit(lambda x, w: conv(x, w))
        t = timeit(f, (x, wts))
        flops = 2 * N * h * w * 9 * ci * co
        byts = 2 * (N * h * w * ci + N * h * w * co)  # bf16 read + write
        report(name, t, flops, byts)

    # fused basic block: conv-relu-conv-add-relu, branch 1 shape
    x = mk((N, 96, 72, 48))
    w1 = mk((3, 3, 48, 48))
    w2 = mk((3, 3, 48, 48))

    @jax.jit
    def block(x, w1, w2):
        y = jax.nn.relu(conv(x, w1))
        y = conv(y, w2)
        return jax.nn.relu(y + x)

    t = timeit(block, (x, w1, w2))
    flops = 2 * 2 * N * 96 * 72 * 9 * 48 * 48
    byts = 2 * N * 96 * 72 * 48 * 4  # in, mid w+r, out
    report("b1 fused block (2 convs)", t, flops, byts)

    # stem: the 640-crop normalize + first stride-2 conv
    u8 = jnp.asarray(rng.integers(0, 255, (N, 384, 288, 3)), jnp.uint8)
    wstem = mk((3, 3, 3, 64))

    @jax.jit
    def stem(u8, w):
        xx = u8.astype(jnp.bfloat16) / 255.0
        return conv(xx, w, stride=2)

    t = timeit(stem, (u8, wstem), vary_idx=0)
    flops = 2 * N * 192 * 144 * 9 * 3 * 64
    byts = N * 384 * 288 * 3 + 2 * N * 192 * 144 * 64
    report("stem u8->bf16 conv s2 (384,288,3->64)", t, flops, byts)

    # 1x1 conv at branch-1 resolution (fuse-layer shape)
    x = mk((N, 96, 72, 96))
    w11 = mk((1, 1, 96, 48))
    f = jax.jit(lambda x, w: conv(x, w))
    t = timeit(f, (x, w11))
    flops = 2 * N * 96 * 72 * 96 * 48
    byts = 2 * (N * 96 * 72 * 96 + N * 96 * 72 * 48)
    report("fuse 1x1 (96,72,96->48)", t, flops, byts)

    # full HRNet-W48 standalone, bf16 vs f32 input, batch 640 vs 128 —
    # the profiler saw 2.6 s (4% MXU) standalone while the fused bench
    # program implies ~3x better; isolate what the standalone program
    # does differently.
    from tpupose.models.hrnet import hrnet_apply, hrnet_init, hrnet_w48_config
    from tpupose.models.layers import fold_batchnorm

    pose_cfg = hrnet_w48_config()
    pose_params = fold_batchnorm(
        hrnet_init(jax.random.PRNGKey(1), pose_cfg), dtype=jnp.bfloat16
    )
    hr_flops_per = 32.9e9  # W48 @ 384x288

    fhr = jax.jit(lambda x: hrnet_apply(pose_params, pose_cfg, x))
    for batch, dt in ((640, jnp.bfloat16), (640, jnp.float32), (128, jnp.bfloat16)):
        x = mk((batch, 384, 288, 3)).astype(dt)
        t = timeit(fhr, (x,), n=3)
        report(f"hrnet-w48 b{batch} {dt.__name__}", t, hr_flops_per * batch,
               2 * batch * 384 * 288 * 3)


if __name__ == "__main__":
    main()
