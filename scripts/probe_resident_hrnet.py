"""Probe: full quantized HRNet-W48 forward, int8-resident vs generic.

The block-level probe (`probe_int8_resident.py`) measured 1.60x on the
branch-1 basic block; this times the WHOLE quantized W48 at the bench
crop batch (640 crops of 384x288 split into chunks that fit HBM beside
the scan) with the fused dispatch on vs off. Timing-only scales
(uncalibrated) — structure identical to calibrated serving.

MEASURED 2026-08-17 (docs/PERF.md round 3): generic 95.8 ms / resident
101.3 ms per 160-crop forward = **0.94x** — XLA already output-fuses the
generic dequant->relu->requant chain in straight-line model code, so the
fusion only wins in contexts that deny XLA that fusion (the scan-carry
block probe). Hence `HRNetConfig.int8_resident` defaults False.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_resident_hrnet.py
"""
from __future__ import annotations

import time

import numpy as np

REPS = 6
BATCH = 160  # per-rep crop batch; 4 reps ~ the bench's 640-crop stage


def main():
    import jax
    import jax.numpy as jnp

    import tpupose.models.quantize as qm
    from tpupose.models.hrnet import hrnet_apply, hrnet_init, hrnet_w48_config
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.quantize import quantize_convs, uncalibrated_scales

    cfg = hrnet_w48_config()
    params = fold_batchnorm(
        hrnet_init(jax.random.PRNGKey(0), cfg), dtype=jnp.bfloat16
    )
    qp = quantize_convs(
        params, uncalibrated_scales(params, qm.hrnet_skip_ids(params)),
        qm.hrnet_skip_ids(params),
    )

    def timed(c, reps):
        @jax.jit
        def prog(seed):
            x0 = jax.random.normal(
                jax.random.PRNGKey(seed),
                (BATCH, *c.input_size, 3), jnp.bfloat16,
            )

            def body(x, _):
                h = hrnet_apply(qp, c, x)
                # fold the heatmap back into the carry so reps chain
                dx = jnp.mean(h.astype(jnp.bfloat16)) * 1e-6
                return x + dx, None

            xr, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(xr.astype(jnp.float32))

        float(prog(jnp.uint32(0)))
        t0 = time.perf_counter()
        float(prog(jnp.uint32(1)))
        return time.perf_counter() - t0

    def run(name, c):
        t1 = timed(c, 1)
        tr = timed(c, REPS)
        per = (tr - t1) / (REPS - 1)
        print(f"{name:28s} {per * 1e3:8.2f} ms/{BATCH}-crop fwd "
              f"({per * 1e3 * 640 / BATCH:7.2f} ms/640)", flush=True)
        return per

    import dataclasses

    a = run("int8 generic (bf16-resident)", cfg)
    b = run("int8 RESIDENT (fused)",
            dataclasses.replace(cfg, int8_resident=True))
    print(f"speedup: {a / b:.2f}x")


if __name__ == "__main__":
    main()
