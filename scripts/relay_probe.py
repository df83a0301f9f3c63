"""Probe the axon relay's execution semantics.

Question: when N varied executions are dispatched but only the LAST output
is fetched, does wall time scale with N (eager execution — loops measure
real throughput) or stay flat (lazy/dead-code-dropping relay — loops only
measure the fetched dependency chain, and any benchmark that fetches one
output per loop overstates throughput by ~N)?

Method: one fat matmul chain as the workload; time loops of n in {1,2,4,8}
dispatches where (a) only the last output is fetched, (b) every output is
folded into a running sum that IS fetched (forces all n).
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


if __name__ == "__main__":
    main()
