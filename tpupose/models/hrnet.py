"""HRNet top-down 2D pose network in JAX (NHWC).

Re-implementation of the reference's external HRNet backend (pose_hrnet_w48,
384x288, 17 joints — config at `src/configs/*/model_configs.yaml:50-61`,
consumed through `HRNetPose.predict` at `src/ivclabpose.py:131-132,208-214`).
Parameter tree nesting mirrors the official torch `pose_hrnet` state_dict
(`conv1/bn1/.../layer1.N.convK/transitionK/stageK.M.branches.B.L/
fuse_layers.I.J/final_layer`), so the checkpoint converter
(`tpupose.models.convert`) is a mechanical walk.

Inference runs in bfloat16 by default (MXU-friendly); params stay f32.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from tpupose.models.layers import (
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    upsample_nearest,
)


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    width: int = 48
    num_joints: int = 17
    input_size: tuple = (384, 288)  # (H, W); heatmaps are (H/4, W/4)
    stem_channels: int = 64
    layer1_blocks: int = 4
    layer1_planes: int = 64
    stage_modules: tuple = (1, 4, 3)  # stages 2, 3, 4
    stage_blocks: int = 4
    #: Serve the C=width high-res branch width-packed (x2 channels, W/2):
    #: ~2x fewer MXU cycles + ~2x less padded HBM traffic for width<=64
    #: (tpupose.ops.packing). Requires a tree transformed by
    #: `pack_hrnet_branch0`; exact reparameterization (docs/PERF.md r3).
    pack_branch0: bool = False
    #: Fused int8-resident blocks (requantize in the conv epilogue so the
    #: inter-conv tensor moves as int8). Measured 1.60x on the isolated
    #: branch-1 block but 0.94x on the WHOLE model — XLA already
    #: output-fuses the generic dequant->relu->requant chain in
    #: straight-line model code — so default off (docs/PERF.md r3).
    int8_resident: bool = False
    #: Sub-pixel decode refinement: "quarter" = official HRNet
    #: quarter-offset toward the stronger neighbor (reference parity;
    #: default). "parabolic" = 3-point parabola vertex — continuous in the
    #: heatmap values, so near-tie neighbors at a centered peak cannot
    #: flip it half a cell; the recommended mode for int8 serving, where
    #: the tie flips dominate the int8-vs-bf16 keypoint shift
    #: (docs/PERF.md r3, scripts/int8_w48_agreement.py).
    decode_refine: str = "quarter"

    @property
    def branch_channels(self):
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    @property
    def heatmap_size(self):
        return (self.input_size[0] // 4, self.input_size[1] // 4)


def hrnet_w48_config():
    return HRNetConfig(width=48)


def hrnet_w32_config(input_size=(256, 192)):
    """The official pose_hrnet_w32 family member (28.5M params; released
    as w32_256x192 and w32_384x288 — same state_dict key set, pinned by
    `tests/test_real_artifact_schema.py`). At 256x192 it is the measured
    fast-serving alternative to W48@384x288: the C=48 lane floor analysis
    (docs/PERF.md r3) concluded a smaller model, not a better emitter, is
    the way past ~75-80 fps/chip."""
    return HRNetConfig(width=32, input_size=tuple(input_size))


def tiny_test_config():
    """Small config for CPU tests: same topology, few channels/blocks."""
    return HRNetConfig(
        width=8,
        input_size=(96, 64),  # must be divisible by 32 (like 384x288)
        stem_channels=16,
        layer1_blocks=1,
        layer1_planes=8,
        stage_modules=(1, 1, 1),
        stage_blocks=1,
    )


# -- parameter construction (torch-shaped nesting) ---------------------------

def _basic_block_init(key, cin, cout):
    k = jax.random.split(key, 3)
    p = {
        "conv1": conv_init(k[0], 3, 3, cin, cout),
        "bn1": bn_init(cout),
        "conv2": conv_init(k[1], 3, 3, cout, cout),
        "bn2": bn_init(cout),
    }
    if cin != cout:
        p["downsample"] = {"0": conv_init(k[2], 1, 1, cin, cout), "1": bn_init(cout)}
    return p


def _bottleneck_init(key, cin, planes, expansion=4):
    k = jax.random.split(key, 4)
    cout = planes * expansion
    p = {
        "conv1": conv_init(k[0], 1, 1, cin, planes),
        "bn1": bn_init(planes),
        "conv2": conv_init(k[1], 3, 3, planes, planes),
        "bn2": bn_init(planes),
        "conv3": conv_init(k[2], 1, 1, planes, cout),
        "bn3": bn_init(cout),
    }
    if cin != cout:
        p["downsample"] = {"0": conv_init(k[3], 1, 1, cin, cout), "1": bn_init(cout)}
    return p


def _fuse_init(key, channels: Sequence[int], out_branches: int):
    """fuse_layers[i][j] params; torch layout (pose_hrnet._make_fuse_layers)."""
    fuse = {}
    keys = jax.random.split(key, out_branches * len(channels) * 8)

    def kk(i, j, k):
        return keys[(i * len(channels) + j) * 8 + k]

    for i in range(out_branches):
        row = {}
        for j in range(len(channels)):
            if j == i:
                continue
            if j > i:
                row[str(j)] = {
                    "0": conv_init(kk(i, j, 0), 1, 1, channels[j], channels[i]),
                    "1": bn_init(channels[i]),
                }
            else:
                seq = {}
                for k in range(i - j):
                    cout = channels[i] if k == i - j - 1 else channels[j]
                    seq[str(k)] = {
                        "0": conv_init(kk(i, j, k), 3, 3, channels[j], cout),
                        "1": bn_init(cout),
                    }
                row[str(j)] = seq
        fuse[str(i)] = row
    return fuse


def _module_init(key, channels, num_blocks, out_branches):
    keys = jax.random.split(key, len(channels) + 1)
    branches = {}
    for b, c in enumerate(channels):
        bkeys = jax.random.split(keys[b], num_blocks)
        branches[str(b)] = {
            str(l): _basic_block_init(bkeys[l], c, c) for l in range(num_blocks)
        }
    return {
        "branches": branches,
        "fuse_layers": _fuse_init(keys[-1], channels, out_branches),
    }


def hrnet_init(key, cfg: HRNetConfig):
    keys = jax.random.split(key, 16)
    w = cfg.branch_channels
    p = {
        "conv1": conv_init(keys[0], 3, 3, 3, cfg.stem_channels),
        "bn1": bn_init(cfg.stem_channels),
        "conv2": conv_init(keys[1], 3, 3, cfg.stem_channels, cfg.stem_channels),
        "bn2": bn_init(cfg.stem_channels),
    }
    # layer1: bottlenecks
    lkeys = jax.random.split(keys[2], cfg.layer1_blocks)
    cin = cfg.stem_channels
    layer1 = {}
    for i in range(cfg.layer1_blocks):
        layer1[str(i)] = _bottleneck_init(lkeys[i], cin, cfg.layer1_planes)
        cin = cfg.layer1_planes * 4
    p["layer1"] = layer1
    c_l1 = cfg.layer1_planes * 4

    # transitions: transitionK maps previous channels to stage K+1 channels
    p["transition1"] = {
        "0": {"0": conv_init(keys[3], 3, 3, c_l1, w[0]), "1": bn_init(w[0])},
        "1": {"0": {"0": conv_init(keys[4], 3, 3, c_l1, w[1]), "1": bn_init(w[1])}},
    }
    p["transition2"] = {
        "2": {"0": {"0": conv_init(keys[5], 3, 3, w[1], w[2]), "1": bn_init(w[2])}},
    }
    p["transition3"] = {
        "3": {"0": {"0": conv_init(keys[6], 3, 3, w[2], w[3]), "1": bn_init(w[3])}},
    }

    for s, (n_mod, n_br) in enumerate(zip(cfg.stage_modules, (2, 3, 4))):
        mkeys = jax.random.split(keys[7 + s], n_mod)
        stage = {}
        for m in range(n_mod):
            # last module of stage4 outputs only the high-res branch
            last_stage = s == len(cfg.stage_modules) - 1
            out_b = 1 if (last_stage and m == n_mod - 1) else n_br
            stage[str(m)] = _module_init(
                mkeys[m], w[:n_br], cfg.stage_blocks, out_b
            )
        p[f"stage{s + 2}"] = stage

    p["final_layer"] = conv_init(keys[12], 1, 1, w[0], cfg.num_joints, bias=True)
    return p


# -- forward -----------------------------------------------------------------

def _basic_block(p, x, resident=False):
    if resident:
        from tpupose.models.quantize import (
            is_quantized_conv,
            quantized_basic_block,
        )

        if (
            is_quantized_conv(p["conv1"])
            and is_quantized_conv(p["conv2"])
            and not p.get("bn1")  # folded (the quantizer contract); a live
            and not p.get("bn2")  # BN between the convs forbids the fusion
        ):
            return quantized_basic_block(p, x)
    y = jax.nn.relu(bn_apply(p["bn1"], conv_apply(p["conv1"], x)))
    y = bn_apply(p["bn2"], conv_apply(p["conv2"], y))
    skip = x
    if "downsample" in p:
        skip = bn_apply(p["downsample"]["1"], conv_apply(p["downsample"]["0"], x))
    return jax.nn.relu(y + skip)


def _bottleneck(p, x, resident=False):
    if resident:
        from tpupose.models.quantize import (
            is_quantized_conv,
            quantized_bottleneck,
        )

        if all(
            is_quantized_conv(p[c]) for c in ("conv1", "conv2", "conv3")
        ) and not (p.get("bn1") or p.get("bn2") or p.get("bn3")):
            return quantized_bottleneck(p, x)
    y = jax.nn.relu(bn_apply(p["bn1"], conv_apply(p["conv1"], x)))
    y = jax.nn.relu(bn_apply(p["bn2"], conv_apply(p["conv2"], y)))
    y = bn_apply(p["bn3"], conv_apply(p["conv3"], y))
    skip = x
    if "downsample" in p:
        skip = bn_apply(p["downsample"]["1"], conv_apply(p["downsample"]["0"], x))
    return jax.nn.relu(y + skip)


def _fuse_apply(fuse, xs, out_branches):
    outs = []
    for i in range(out_branches):
        acc = None
        for j, xj in enumerate(xs):
            if j == i:
                y = xj
            elif j > i:
                f = fuse[str(i)][str(j)]
                y = bn_apply(f["1"], conv_apply(f["0"], xj))
                y = upsample_nearest(y, 2 ** (j - i))
            else:
                f = fuse[str(i)][str(j)]
                y = xj
                n = i - j
                for k in range(n):
                    seq = f[str(k)]
                    y = bn_apply(seq["1"], conv_apply(seq["0"], y, stride=2))
                    if k != n - 1:
                        y = jax.nn.relu(y)
            acc = y if acc is None else acc + y
        outs.append(jax.nn.relu(acc))
    return outs


def _module_apply(p, xs, out_branches, pack0=False, resident=False):
    from tpupose.ops.packing import pack_width, unpack_width

    ys = []
    for b, x in enumerate(xs):
        blocks = p["branches"][str(b)]
        if pack0 and b == 0:
            x = pack_width(x)  # branch-0 blocks carry width-packed kernels
        for l in range(len(blocks)):
            x = _basic_block(blocks[str(l)], x, resident=resident)
        if pack0 and b == 0:
            x = unpack_width(x)
        ys.append(x)
    return _fuse_apply(p["fuse_layers"], ys, out_branches)


def hrnet_apply(params, cfg: HRNetConfig, x, compute_dtype=jnp.bfloat16):
    """Forward pass: (N, H, W, 3) normalized image -> (N, H/4, W/4, J)
    heatmaps (f32)."""
    x = x.astype(compute_dtype)
    x = jax.nn.relu(bn_apply(params["bn1"], conv_apply(params["conv1"], x, stride=2)))
    x = jax.nn.relu(bn_apply(params["bn2"], conv_apply(params["conv2"], x, stride=2)))
    resident = cfg.int8_resident
    for i in range(cfg.layer1_blocks):
        x = _bottleneck(params["layer1"][str(i)], x, resident=resident)

    # transition1
    t1 = params["transition1"]
    x0 = jax.nn.relu(bn_apply(t1["0"]["1"], conv_apply(t1["0"]["0"], x)))
    b1 = t1["1"]["0"]
    x1 = jax.nn.relu(bn_apply(b1["1"], conv_apply(b1["0"], x, stride=2)))
    xs = [x0, x1]

    pack0 = cfg.pack_branch0
    for m in range(len(params["stage2"])):
        out_b = 2
        xs = _module_apply(params["stage2"][str(m)], xs, out_b, pack0=pack0,
                           resident=resident)

    t2 = params["transition2"]["2"]["0"]
    xs = xs + [jax.nn.relu(bn_apply(t2["1"], conv_apply(t2["0"], xs[-1], stride=2)))]
    for m in range(len(params["stage3"])):
        xs = _module_apply(params["stage3"][str(m)], xs, 3, pack0=pack0,
                           resident=resident)

    t3 = params["transition3"]["3"]["0"]
    xs = xs + [jax.nn.relu(bn_apply(t3["1"], conv_apply(t3["0"], xs[-1], stride=2)))]
    n_mod4 = len(params["stage4"])
    for m in range(n_mod4):
        out_b = 1 if m == n_mod4 - 1 else 4
        xs = _module_apply(params["stage4"][str(m)], xs, out_b, pack0=pack0,
                           resident=resident)

    heat = conv_apply(params["final_layer"], xs[0])
    return heat.astype(jnp.float32)


#: ImageNet normalization used by simple-HRNet's transform.
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_image(x, value_scale=255.0):
    """RGB (..., 3) in [0, value_scale] -> ImageNet-normalized float.

    Floating inputs keep their dtype (a bf16 crop pipeline stays bf16 —
    the downstream HRNet computes in bf16 anyway); integer inputs promote
    to f32."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    dt = x.dtype
    x = x / jnp.asarray(value_scale, dt)
    return (x - IMAGENET_MEAN.astype(dt)) * (1.0 / IMAGENET_STD).astype(dt)
