"""Honest device timing of the int8 backbones vs bf16 (in-jit chained).

Quantization scales are synthetic (absmax=1) — irrelevant for timing.
Locates where the int8 win goes (per-shape probes said 1.25-1.6x, the
composed bench only moved 1.13x): unfused quant passes, the bf16 residual
stream, or the fuse layers.
"""
from __future__ import annotations

import time

import numpy as np


def collect_conv_ids(params, skip=()):
    out = {}

    def walk(node):
        if not isinstance(node, dict):
            return
        if "weight" in node and getattr(node["weight"], "ndim", 0) == 4:
            if id(node) not in skip:
                out[id(node)] = 1.0
            return
        for v in node.values():
            walk(v)

    walk(params)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from tpupose.models.hrnet import hrnet_apply, hrnet_init, hrnet_w48_config
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.quantize import (
        hrnet_skip_ids,
        quantize_convs,
        yolo_skip_ids,
    )
    from tpupose.models.yolov3 import YoloConfig, yolov3_apply, yolov3_init

    def chain_time(make_x, step, reps, n=2):
        @jax.jit
        def prog(seed):
            def body(x, _):
                return step(x), None

            y, _ = jax.lax.scan(body, make_x(seed), None, length=reps)
            return jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32))

        float(prog(jnp.uint32(0)))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = prog(jnp.uint32(i))
        float(out)
        return (time.perf_counter() - t0) / n

    def stage(name, make_x, step):
        t1 = chain_time(make_x, step, 1)
        t4 = chain_time(make_x, step, 4)
        per = (t4 - t1) / 3
        print(f"{name:34s} {per * 1e3:9.1f} ms", flush=True)

    pose_cfg = hrnet_w48_config()
    pose_bf = fold_batchnorm(
        hrnet_init(jax.random.PRNGKey(1), pose_cfg), dtype=jnp.bfloat16
    )
    pose_q = quantize_convs(
        pose_bf, collect_conv_ids(pose_bf, hrnet_skip_ids(pose_bf))
    )

    N = 640

    def mk_crops(seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (N, 384, 288, 3), jnp.bfloat16
        )

    def step_bf(x):
        h = hrnet_apply(pose_bf, pose_cfg, x)
        return x + jnp.mean(h).astype(jnp.bfloat16) * 0

    def step_q(x):
        h = hrnet_apply(pose_q, pose_cfg, x)
        return x + jnp.mean(h).astype(jnp.bfloat16) * 0

    stage("hrnet-w48 int8 (640)", mk_crops, step_q)
    stage("hrnet-w48 bf16 (640)", mk_crops, step_bf)

    det_cfg = YoloConfig(max_candidates=4)
    det_bf = fold_batchnorm(
        yolov3_init(jax.random.PRNGKey(0), det_cfg), dtype=jnp.bfloat16
    )
    det_q = quantize_convs(
        det_bf, collect_conv_ids(det_bf, yolo_skip_ids(det_bf, det_cfg))
    )

    M = 160

    def mk_imgs(seed):
        return jax.random.uniform(
            jax.random.PRNGKey(seed), (M, 416, 416, 3), jnp.bfloat16
        )

    def ystep(params):
        def step(x):
            heads = yolov3_apply(params, det_cfg, x)
            return x + jnp.mean(heads[0]).astype(jnp.bfloat16) * 0

        return step

    stage("yolov3 int8 fwd (160)", mk_imgs, ystep(det_q))
    stage("yolov3 bf16 fwd (160)", mk_imgs, ystep(det_bf))


if __name__ == "__main__":
    main()
