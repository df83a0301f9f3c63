"""Probe: int8-RESIDENT intermediates for the branch-1 basic block.

The serving int8 conv dequantizes every output to bf16; the next conv
re-quantizes. The inter-conv tensor therefore moves as bf16 (2 bytes,
2.67x lane padding). If the conv1 epilogue requantized straight to int8
(zero-point-0 makes relu exact in the integer domain), the intermediate
halves to 1 byte — candidate ~0.7 ms/block on the 64 branch-0 convs.

This measures speed only (scales chosen for arithmetic plausibility, not
calibrated). In-jit scan chaining per docs/PERF.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_resident.py
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

    def mkq():
        w = rng.standard_normal((3, 3, C, C)) * 0.05
        ws = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        return (
            jnp.asarray(np.clip(np.round(w / ws), -127, 127), jnp.int8),
            jnp.asarray(ws, jnp.float32),
        )

    wq1, ws1 = mkq()
    wq2, ws2 = mkq()
    xs1 = jnp.float32(3.0 / 127.0)   # conv1 input scale
    xs2 = jnp.float32(3.0 / 127.0)   # conv2 input scale
    bias1 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    bias2 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)

    def conv_i8(xq, wq):
        return jax.lax.conv_general_dilated(
            xq, wq, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def quant(x, xs):
        return jnp.clip(
            jnp.round(x.astype(jnp.bfloat16) * (1.0 / xs).astype(jnp.bfloat16)),
            -127, 127,
        ).astype(jnp.int8)

    def block_current(x):
        """Today's path: bf16-resident activations."""
        y = conv_i8(quant(x, xs1), wq1).astype(jnp.float32) * (ws1 * xs1)
        y = jax.nn.relu((y + bias1).astype(jnp.bfloat16))
        z = conv_i8(quant(y, xs2), wq2).astype(jnp.float32) * (ws2 * xs2)
        z = (z + bias2).astype(jnp.bfloat16)
        return jax.nn.relu(z + x).astype(jnp.bfloat16)

    # int8-resident: conv1 epilogue requantizes int32 -> int8 directly
    # (per-channel rescale r = ws1*xs1/xs2; relu == max(.,0) exactly).
    r1 = (ws1 * xs1 / xs2).astype(jnp.float32)
    bias1_q = (bias1 / xs2).astype(jnp.float32)

    def block_resident(x):
        y32 = conv_i8(quant(x, xs1), wq1)
        yq = jnp.clip(
            jnp.round(
                jax.nn.relu(y32.astype(jnp.float32) * r1 + bias1_q)
            ),
            0, 127,
        ).astype(jnp.int8)
        z = conv_i8(yq, wq2).astype(jnp.float32) * (ws2 * xs2)
        z = (z + bias2).astype(jnp.bfloat16)
        return jax.nn.relu(z + x).astype(jnp.bfloat16)

    def timed_scan(step, reps):
        @jax.jit
        def prog(seed):
            x0 = jax.random.normal(
                jax.random.PRNGKey(seed), (N, H, W, C), jnp.bfloat16
            )

            def body(x, _):
                return step(x), None

            xr, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(xr.astype(jnp.float32))

        float(prog(jnp.uint32(0)))
        t0 = time.perf_counter()
        float(prog(jnp.uint32(1)))
        return time.perf_counter() - t0

    def run(name, step):
        t1 = timed_scan(step, 1)
        tr = timed_scan(step, REPS)
        per = (tr - t1) / (REPS - 1)
        print(f"{name:40s} {per * 1e3:8.3f} ms/block", flush=True)
        return per

    a = run("int8 block bf16-resident (current)", block_current)
    b = run("int8 block int8-resident mid", block_resident)
    print(f"speedup: {a / b:.2f}x")


if __name__ == "__main__":
    main()
