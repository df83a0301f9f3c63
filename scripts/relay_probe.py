"""Probe the axon relay's measurement model (docs/PERF.md round 2).

Default mode — execution semantics: when N varied executions are
dispatched but only the LAST output is fetched, does wall time scale with
N (eager execution — loops measure real throughput) or stay flat
(lazy/dead-code-dropping relay — loops only measure the fetched
dependency chain, and any benchmark that fetches one output per loop
overstates throughput by ~N)? Method: one fat matmul chain as the
workload; time loops of n in {1,2,4,8} dispatches where (a) only the
last output is fetched, (b) every output is folded into a running sum
that IS fetched (forces all n).

--data mode — data movement: the conv microbench saw a single
(640,96,72,48) 3x3 conv cost 236 ms (0.4% MXU, ~4 GB/s of its input
bytes) while the big fused bench program achieves ~33% composite MXU.
Hypothesis: the relay ships argument buffers (host->device) per execute
at a few GB/s, so small-program loops measure the wire, not the chip.
Probes: (1) explicit device_put of 424 MB -> upload bandwidth;
(2) np.asarray fetch -> download bandwidth; (3) conv loop, big input
FIXED, scalar varied -> marginal cost without re-upload; (4) conv loop,
big input varied -> reproduces the microbench; (5) chained conv loop in
ONE jit -> pure device compute per conv, no per-op dispatch.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 8192
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)

    @jax.jit
    def work(x, i):
        y = x + i.astype(jnp.bfloat16)
        for _ in range(4):
            y = jnp.tanh(y @ y * 1e-4)
        return y

    # warmup/compile
    i0 = jnp.float32(0.0)
    float(jnp.sum(work(a, i0).astype(jnp.float32)))
    # 4 matmuls of 2*8192^3 = 4.4 TFLOP -> ~22 ms at v5e peak.

    for n in (1, 2, 4, 8):
        t0 = time.perf_counter()
        out = None
        for i in range(1, n + 1):
            out = work(a, jnp.float32(i))
        float(jnp.sum(out.astype(jnp.float32)))
        t_last = time.perf_counter() - t0

        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(1, n + 1):
            acc = acc + jnp.sum(work(a, jnp.float32(100 + i)).astype(jnp.float32))
        float(acc)
        t_all = time.perf_counter() - t0
        print(f"n={n}:  fetch-last {t_last*1e3:8.1f} ms   "
              f"fetch-all {t_all*1e3:8.1f} ms", flush=True)


def data_movement():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, H, W, C = 640, 96, 72, 48
    xh = rng.standard_normal((N, H, W, C)).astype(np.float32)

    t0 = time.perf_counter()
    x = jax.device_put(jnp.asarray(xh, jnp.bfloat16))
    x.block_until_ready()
    t = time.perf_counter() - t0
    nbytes = N * H * W * C * 2
    print(f"upload {nbytes/1e6:.0f} MB: {t*1e3:.1f} ms = {nbytes/t/1e9:.2f} GB/s",
          flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(x)
    t = time.perf_counter() - t0
    print(f"download {nbytes/1e6:.0f} MB: {t*1e3:.1f} ms = {nbytes/t/1e9:.2f} GB/s",
          flush=True)

    w = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    flops = 2 * N * H * W * 9 * C * C

    # 3: fixed big input, varied scalar
    f_scal = jax.jit(lambda x, w, s: conv(x, w) * s)
    float(jnp.sum(f_scal(x, w, jnp.bfloat16(1.0)).astype(jnp.float32)))
    n = 5
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = f_scal(x, w, jnp.bfloat16(1.0 + i))
    float(jnp.sum(out.astype(jnp.float32)))
    t = (time.perf_counter() - t0) / n
    print(f"conv fixed-input varied-scalar: {t*1e3:8.2f} ms/iter "
          f"({flops/t/1e12:5.1f} TF/s)", flush=True)

    # 4: varied big input (microbench repro)
    f = jax.jit(conv)
    float(jnp.sum(f(x, w).astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = f(x + jnp.bfloat16(i), w)
    float(jnp.sum(out.astype(jnp.float32)))
    t = (time.perf_counter() - t0) / n
    print(f"conv varied-input:              {t*1e3:8.2f} ms/iter "
          f"({flops/t/1e12:5.1f} TF/s)", flush=True)

    # 5: chained convs inside one jit — pure device compute per conv
    REPS = 20

    @jax.jit
    def chain(x, w, s):
        y = x * s

        def body(y, _):
            return conv(y, w) * jnp.bfloat16(0.25), None

        y, _ = jax.lax.scan(body, y, None, length=REPS)
        return y

    float(jnp.sum(chain(x, w, jnp.bfloat16(1.0)).astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = chain(x, w, jnp.bfloat16(1.0 + 0.1 * i))
    float(jnp.sum(out.astype(jnp.float32)))
    t = (time.perf_counter() - t0) / n / REPS
    print(f"conv chained in-jit (x{REPS}):     {t*1e3:8.2f} ms/conv "
          f"({flops/t/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    import sys

    if "--data" in sys.argv:
        data_movement()
    else:
        main()
