"""Probe int8 conv support + speed on the v5e via axon.

v5e MXU peak: 197 TFLOP/s bf16, 394 TOPS int8. If XLA lowers
int8xint8->int32 convs to the MXU, the branch-1 HRNet conv (lane-padding
HBM-bound in bf16) should run ~2x faster and the >=128-channel convs ~2x.
Chained in-jit timing (relay artifacts cancelled — docs/PERF.md).
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def chain_time(x, w, conv_fn, reps=20, n=3):
        @jax.jit
        def prog(x, w, s):
            def body(y, _):
                o = conv_fn(y, w)
                # renormalize int32 -> int8 range to keep values sane
                y2 = jnp.clip(o // 1024, -127, 127).astype(x.dtype)
                return y2, None

            y, _ = jax.lax.scan(body, x + s, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        float(prog(x, w, x.dtype.type(0)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = prog(x, w, x.dtype.type(i))
        float(out)
        return (time.perf_counter() - t0) / n / reps

    def conv_i8(y, w):
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    N = 640
    for (h, ww, c, name) in ((96, 72, 48, "b1"), (48, 36, 96, "b2"),
                             (24, 18, 192, "b3"), (52, 52, 256, "yolo-mid")):
        x = jnp.asarray(rng.integers(-64, 64, (N, h, ww, c)), jnp.int8)
        w = jnp.asarray(rng.integers(-64, 64, (3, 3, c, c)), jnp.int8)
        try:
            t = chain_time(x, w, conv_i8)
            flops = 2 * N * h * ww * 9 * c * c
            print(f"int8 {name} ({h},{ww},{c}): {t*1e3:7.2f} ms/conv "
                  f"({flops/t/1e12:6.1f} TOP/s)", flush=True)
        except Exception as e:
            print(f"int8 {name}: FAILED {type(e).__name__}: {e}", flush=True)

    # bf16 reference points with the same harness
    def conv_bf(y, w):
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def chain_time_bf(x, w, reps=20, n=3):
        @jax.jit
        def prog(x, w, s):
            def body(y, _):
                return conv_bf(y, w) * jnp.bfloat16(0.25), None

            y, _ = jax.lax.scan(body, x + s, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        float(prog(x, w, jnp.bfloat16(0)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = prog(x, w, jnp.bfloat16(i))
        float(out)
        return (time.perf_counter() - t0) / n / reps

    for (h, ww, c, name) in ((48, 36, 96, "b2"), (24, 18, 192, "b3"),
                             (52, 52, 256, "yolo-mid")):
        x = jnp.asarray(rng.standard_normal((N, h, ww, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.bfloat16)
        t = chain_time_bf(x, w)
        flops = 2 * N * h * ww * 9 * c * c
        print(f"bf16 {name} ({h},{ww},{c}): {t*1e3:7.2f} ms/conv "
              f"({flops/t/1e12:6.1f} TF/s)", flush=True)

    # int8 quant/dequant elementwise overhead at branch-1 size
    xb = jnp.asarray(rng.standard_normal((N, 96, 72, 48)), jnp.bfloat16)

    @jax.jit
    def qdq(x, s):
        q = jnp.clip(jnp.round((x + s) * jnp.bfloat16(32.0)), -127, 127)
        return jnp.sum(q.astype(jnp.float32))

    float(qdq(xb, jnp.bfloat16(0)))
    t0 = time.perf_counter()
    for i in range(1, 4):
        out = qdq(xb, jnp.bfloat16(i))
    float(out)
    t = (time.perf_counter() - t0) / 3
    print(f"quant pass (640,96,72,48) bf16->i8: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
