"""Minimal NHWC conv-net primitives with torch-compatible parameter layout.

The neural backends are re-built in JAX rather than wrapped from PyTorch
(the reference consumes external CUDA models, `src/backend/` — SURVEY.md §2).
Parameters live in plain nested dicts whose leaf names mirror torch
state_dict conventions (`weight`, `bias`, `running_mean`, `running_var`), so
checkpoint conversion is a mechanical key walk + OIHW->HWIO transpose.

Layout: activations NHWC (TPU-native), conv kernels HWIO. Matmul-heavy ops
default to bfloat16-friendly precision (the XLA default); geometry-grade
precision is not needed inside the CNNs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv_init(key, kh, kw, cin, cout, bias=False, scale=None):
    """He-normal conv parameters."""
    wkey, _ = jax.random.split(key)
    fan_in = kh * kw * cin
    std = scale if scale is not None else np.sqrt(2.0 / fan_in)
    p = {"weight": jax.random.normal(wkey, (kh, kw, cin, cout), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv_apply(p, x, stride=1, padding="TORCH", dilation=1):
    """Conv with torch-compatible padding semantics.

    padding="TORCH" pads symmetrically by k//2 per side (torch Conv2d
    padding=k//2). This matters at stride 2: XLA's "SAME" pads (0, 1)
    asymmetrically there, which would silently diverge from converted torch
    checkpoints.

    Dispatches to the int8 path when `p` is a quantized conv dict
    (tpupose.models.quantize), and reports the input range to an active
    calibration recorder.
    """
    if "weight_q" in p:
        from tpupose.models.quantize import quantized_conv_apply

        return quantized_conv_apply(p, x, stride=stride, padding=padding,
                                    dilation=dilation)
    if "fq_x_scale" in p:
        from tpupose.models.quantize import fake_quant_conv_apply

        return fake_quant_conv_apply(p, x, stride=stride, padding=padding,
                                     dilation=dilation)
    from tpupose.models.quantize import ActRecorder

    if ActRecorder.active is not None:
        ActRecorder.active.observe(p, x)
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if padding == "TORCH":
        kh, kw = p["weight"].shape[0], p["weight"].shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=s,
        padding=padding,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def bn_init(c):
    return {
        "weight": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }


class BNStatRecorder:
    """Collects per-BN input batch statistics during one traced forward
    (same tap pattern as `quantize.ActRecorder`); used by
    `quantize.calibrate_bn_stats` to re-estimate running stats on data.

    While active, `bn_apply` normalizes by the CURRENT batch statistics
    (train-mode BN) rather than the stored running stats. That makes the
    recorded stats self-consistent in ONE pass: each BN's input is
    already normalized by everything upstream, exactly as it will be
    once the stats are written back. (A passive tap + parallel write-back
    is a Jacobi iteration that OSCILLATES on deep nets — measured on
    W48: iter-2 variances hit 1e35 and 87 BNs died to constants.)"""

    active = None

    def __init__(self):
        self.taps = []  # (bn_param_dict, traced_mean, traced_var)

    def observe(self, p, x):
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        m, v = jnp.mean(xf, axes), jnp.var(xf, axes)
        self.taps.append((p, m, v))
        return m, v


def bn_apply(p, x, eps=1e-5):
    """Inference-mode batch norm (frozen statistics).

    Training runs in this framework fine-tune with frozen BN (standard for
    pose backbones); gradients flow through the affine parameters.

    An empty dict means the BN was folded into the preceding conv by
    `fold_batchnorm` — pass through.
    """
    if not p:
        return x
    if BNStatRecorder.active is not None:
        m, v = BNStatRecorder.active.observe(p, x)
    else:
        m, v = p["running_mean"], p["running_var"]
    inv = jax.lax.rsqrt(v + eps) * p["weight"]
    return x * inv.astype(x.dtype) + (p["bias"] - m * inv).astype(x.dtype)


def fold_batchnorm(params, eps=1e-5, dtype=None):
    """Fold every (conv, bn) pair into the conv weights for inference.

    Walks the param tree; wherever a dict holds both a conv (4D 'weight')
    and a sibling BN dict that normalizes its output, the BN's affine form
    y = (conv(x) - mean) * gamma/sqrt(var+eps) + beta
    is absorbed: w' = w * s (per output channel), b' = beta - mean * s
    (+ b * s if the conv had a bias). BN dicts become empty (bn_apply
    passes through). Exact for frozen statistics; removes ~2 elementwise
    passes per conv and halves param traffic when dtype=bfloat16.

    The numeric work runs as ONE jitted program on whatever device holds
    the tree (the walk is structural, so tracing it is free): folding a
    TPU-resident tree (e.g. one just trained on-chip) must not round-trip
    the host — through the axon relay that download runs at ~1 MB/s
    (docs/PERF.md), ~4 min for the 254 MB W48 tree.

    Pairing rule (matches this codebase's torch-shaped trees):
      * siblings named convN / bnN            (HRNet blocks, stem)
      * siblings named '0' (conv) / '1' (bn)  (transitions, fuse layers,
                                               downsample)
      * siblings named 'conv' / 'bn'          (YOLO conv modules)
    """

    def is_conv(d):
        return isinstance(d, dict) and "weight" in d and getattr(
            d["weight"], "ndim", 0
        ) == 4

    def is_bn(d):
        return isinstance(d, dict) and "running_mean" in d

    def fold_pair(conv, bn):
        s = (
            bn["weight"].astype(jnp.float32)
            * jax.lax.rsqrt(bn["running_var"].astype(jnp.float32) + eps)
        )
        b = bn["bias"].astype(jnp.float32) - bn["running_mean"].astype(
            jnp.float32
        ) * s
        w = conv["weight"].astype(jnp.float32) * s[None, None, None, :]
        if "bias" in conv:
            b = b + conv["bias"].astype(jnp.float32) * s
        # fold math in f32, result in the tree's own dtype (callers pick
        # the serving dtype via the `dtype` arg)
        return {
            "weight": w.astype(conv["weight"].dtype),
            "bias": b.astype(bn["bias"].dtype),
        }

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        keys = list(node.keys())
        for k in keys:
            if not is_conv(node[k]):
                continue
            partner = None
            if k.startswith("conv") and ("bn" + k[4:]) in node and is_bn(
                node.get("bn" + k[4:])
            ):
                partner = "bn" + k[4:]
            elif k == "conv" and is_bn(node.get("bn")):
                partner = "bn"
            else:
                try:
                    nxt = str(int(k) + 1)
                except ValueError:
                    nxt = None
                if nxt is not None and is_bn(node.get(nxt)):
                    partner = nxt
            if partner is not None:
                node[k] = fold_pair(node[k], node[partner])
                node[partner] = {}
        return node

    def _fold(tree):
        folded = walk(tree)
        if dtype is not None:
            folded = cast_params(folded, dtype)
        return folded

    return jax.jit(_fold)(params)


def cast_params(params, dtype):
    """Cast all float param leaves (useful: bfloat16 inference weights, so
    per-call weight casts/relayouts disappear)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def conv_bn_init(key, kh, kw, cin, cout):
    return {"conv": conv_init(key, kh, kw, cin, cout), "bn": bn_init(cout)}


def conv_bn_apply(p, x, stride=1, padding="TORCH", relu=True):
    y = bn_apply(p["bn"], conv_apply(p["conv"], x, stride=stride, padding=padding))
    return jax.nn.relu(y) if relu else y


def max_pool(x, window=2, stride=2):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "SAME",
    )


def upsample_nearest(x, factor):
    """Nearest-neighbor upsample by an integer factor (torch Upsample)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def leaky_relu(x, slope=0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)
