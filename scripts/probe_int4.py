"""Probe int4 conv support/speed on the v5e via axon (w4a4).

If the MXU runs int4 natively (~788 TOPS), the lane-padding-limited
branch-1 HRNet conv floor halves again vs int8. Accuracy at w4a4 is a real
risk for sub-pixel heatmap decode — this probe is about feasibility only.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N = 640

    def chain_time(x, w, reps=20, n=3):
        @jax.jit
        def prog(x, w, s):
            def body(y, _):
                o = jax.lax.conv_general_dilated(
                    y, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                y2 = jnp.clip(o // 512, -7, 7).astype(x.dtype)
                return y2, None

            y, _ = jax.lax.scan(body, x + s, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        float(prog(x, w, jnp.zeros((), x.dtype)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = prog(x, w, jnp.full((), i % 3, x.dtype))
        float(out)
        return (time.perf_counter() - t0) / n / reps

    for h, ww, c, name in ((96, 72, 48, "b1"), (24, 18, 192, "b3")):
        try:
            x = jnp.asarray(rng.integers(-7, 7, (N, h, ww, c))).astype(jnp.int4)
            w = jnp.asarray(rng.integers(-7, 7, (3, 3, c, c))).astype(jnp.int4)
            t = chain_time(x, w)
            flops = 2 * N * h * ww * 9 * c * c
            print(f"int4 {name} ({h},{ww},{c}): {t*1e3:7.2f} ms/conv "
                  f"({flops/t/1e12:6.1f} TOP/s)", flush=True)
        except Exception as e:
            print(f"int4 {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
