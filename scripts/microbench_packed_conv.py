"""Measure the width-packing reparameterization on the chip (in-jit scan
chaining per docs/PERF.md — single-op loops measure the relay, not the
TPU).

Times the HRNet branch-1 basic block (conv-relu-conv-add-relu at
(640, 96, 72, 48), the bench crop batch) four ways: bf16/int8 x
unpacked/width-packed. The packed form runs at (640, 96, 36, 96) with
structured-zero 3x3 kernels: 2x FLOPs, ~4x lane utilization, ~2x less
padded HBM traffic (tpupose/ops/packing.py). Accept/reject integration by
these numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_packed_conv.py
"""
from __future__ import annotations

import time

import numpy as np

REPS = 12
N, H, W, C = 640, 96, 72, 48


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.models.layers import conv_apply
    from tpupose.models.quantize import quantize_convs
    from tpupose.ops.packing import pack_conv_dict_width, pack_width

    rng = np.random.default_rng(0)

    def mkw():
        return {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16
            ),
            "bias": jnp.zeros((C,), jnp.bfloat16),
        }

    w1, w2 = mkw(), mkw()
    q1 = quantize_convs({"c": w1}, {id(w1): 3.0})["c"]
    q2 = quantize_convs({"c": w2}, {id(w2): 3.0})["c"]
    pw1, pw2 = pack_conv_dict_width(w1), pack_conv_dict_width(w2)
    pq1, pq2 = pack_conv_dict_width(q1), pack_conv_dict_width(q2)

    def block(p1, p2):
        def step(x):
            y = jax.nn.relu(conv_apply(p1, x))
            y = conv_apply(p2, y)
            return jax.nn.relu((y + x).astype(x.dtype))

        return step

    def timed_scan(make_input, step, reps):
        @jax.jit
        def prog(seed):
            x0 = make_input(seed)

            def body(x, _):
                return step(x), None

            xr, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(xr.astype(jnp.float32))

        float(prog(jnp.uint32(0)))  # compile + warm
        t0 = time.perf_counter()
        float(prog(jnp.uint32(1)))
        return time.perf_counter() - t0

    def run(name, make_input, step):
        t1 = timed_scan(make_input, step, 1)
        tr = timed_scan(make_input, step, REPS)
        per = (tr - t1) / (REPS - 1)
        print(f"{name:40s} {per * 1e3:8.3f} ms/block", flush=True)
        return per

    def mk_plain(seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (N, H, W, C), jnp.bfloat16
        )

    def mk_packed(seed):
        return pack_width(mk_plain(seed))

    r = {}
    r["bf16 unpacked"] = run("bf16 block (640,96,72,48)", mk_plain,
                             block(w1, w2))
    r["bf16 packed"] = run("bf16 packed block (640,96,36,96)", mk_packed,
                           block(pw1, pw2))
    r["int8 unpacked"] = run("int8 block (640,96,72,48)", mk_plain,
                             block(q1, q2))
    r["int8 packed"] = run("int8 packed block (640,96,36,96)", mk_packed,
                           block(pq1, pq2))
    print(
        f"speedup: bf16 {r['bf16 unpacked'] / r['bf16 packed']:.2f}x, "
        f"int8 {r['int8 unpacked'] / r['int8 packed']:.2f}x"
    )


if __name__ == "__main__":
    main()
