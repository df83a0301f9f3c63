"""Measure batch->channel folding via GROUPED convolution on the chip.

Third lane-floor mechanism (after width-packing 0.86x and int8-resident
0.94x, docs/PERF.md round 3): fold G batch samples into the channel dim
and run ONE grouped conv with feature_group_count=G —

  plain:   (N, H, W, 48)   conv (3,3,48,48)            -> (N, H, W, 48)
  grouped: (N/G, H, W, 48G) conv (3,3,48,48G) groups=G -> (N/G, H, W, 48G)

Unlike width-packing (structured-zero kernels = 2x FLOPs) this is
FLOP-NEUTRAL: group g of the output uses only input block g, and all
groups share the same per-sample weights (the kernel is the plain kernel
tiled G times along cout). If XLA's TPU emitter executes the grouped GEMM
with the full 48G output-lane dim, branch-0's 37.5% lane occupancy
becomes 75/150/300% -> up to ~2x. If it instead splits groups into G
separate convs (or expands to a dense conv with zero blocks = G x FLOPs),
it loses. Measurement decides, like the two precedents.

Times the branch-1 basic block (conv-relu-conv-add-relu) at the bench
crop batch (640, 96, 72, 48), bf16 and int8, G in {1, 2, 4, 8}. All
variants do identical total math; ms/block is directly comparable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_grouped_conv.py
"""
from __future__ import annotations

import time

import numpy as np

REPS = 12
N, H, W, C = 640, 96, 72, 48


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)

    def conv(x, w, groups):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    def conv_i8(xq, wq, groups):
        return jax.lax.conv_general_dilated(
            xq, wq, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )

    def q8(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
        return jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                        ).astype(jnp.int8), s

    def block_bf16(g):
        # kernel tiled G times along cout: every group applies the SAME
        # per-sample weights (exactly the plain conv on each folded sample)
        wg1 = jnp.tile(w1, (1, 1, 1, g))
        wg2 = jnp.tile(w2, (1, 1, 1, g))

        def step(x):
            y = jax.nn.relu(conv(x, wg1, g))
            y = conv(y, wg2, g)
            return jax.nn.relu((y + x).astype(x.dtype))

        return step

    def block_int8(g):
        q1, s1 = q8(jnp.tile(w1, (1, 1, 1, g)))
        q2, s2 = q8(jnp.tile(w2, (1, 1, 1, g)))
        xs = jnp.float32(3.0 / 127.0)  # fixed per-tensor input scale

        def quant(x):
            return jnp.clip(
                jnp.round(x.astype(jnp.float32) / xs), -127, 127
            ).astype(jnp.int8)

        def step(x):
            y = conv_i8(quant(x), q1, g).astype(jnp.float32) * (s1 * xs)
            y = jax.nn.relu(y).astype(jnp.bfloat16)
            y = conv_i8(quant(y), q2, g).astype(jnp.float32) * (s2 * xs)
            return jax.nn.relu((y.astype(jnp.bfloat16) + x))

        return step

    def timed_scan(g, step, reps):
        @jax.jit
        def prog(seed):
            x0 = jax.random.normal(
                jax.random.PRNGKey(seed), (N // g, H, W, C * g), jnp.bfloat16
            )

            def body(x, _):
                return step(x), None

            xr, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(xr.astype(jnp.float32))

        float(prog(jnp.uint32(0)))  # compile + warm
        t0 = time.perf_counter()
        float(prog(jnp.uint32(1)))
        return time.perf_counter() - t0

    def run(name, g, step):
        t1 = timed_scan(g, step, 1)
        tr = timed_scan(g, step, REPS)
        per = (tr - t1) / (REPS - 1)
        print(f"{name:44s} {per * 1e3:8.3f} ms/block", flush=True)
        return per

    base = {}
    for g in (1, 2, 4, 8):
        t = run(f"bf16 block G={g} ({N // g},{H},{W},{C * g})", g,
                block_bf16(g))
        base.setdefault("bf16", t)
        if g > 1:
            print(f"  -> bf16 G={g} speedup {base['bf16'] / t:.2f}x",
                  flush=True)
    for g in (1, 2, 4, 8):
        t = run(f"int8 block G={g} ({N // g},{H},{W},{C * g})", g,
                block_int8(g))
        base.setdefault("int8", t)
        if g > 1:
            print(f"  -> int8 G={g} speedup {base['int8'] / t:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
