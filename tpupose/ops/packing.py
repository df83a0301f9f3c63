"""Width-packing reparameterization for narrow-channel convs (TPU).

The HRNet high-res branch runs 3x3 stride-1 convs at C=48. TPU vector
lanes are 128 wide: a 48-channel minor dim pads to 128, so those convs use
37.5% of the MXU's output lanes and move 2.67x the HBM bytes
(docs/PERF.md — they are 81% of the serving pipeline). Packing width
pairs into channels, x(N, H, W, 48) -> y(N, H, W/2, 96), keeps the channel
dim within ONE 128-lane block while halving the spatial positions: the
equivalent conv does 2x the FLOPs (a 3x3 kernel on packed blocks has 50%
structured zeros) but ~4x the lane utilization — net ~2x fewer MXU cycles
and ~2x less padded traffic for C<=64 convs. An EXACT reparameterization:
zeros contribute nothing, zero padding maps to zero padding (and symmetric
zero-point-0 int8 keeps zero exact), so packed and unpacked pipelines agree
to float associativity.

Layout: packed channel p*C + c holds original column 2*J + p (phase-major
blocks). The packed kernel entry is
    W'[dy, B+1, p*C+ci, q*C+co] = W[dy, dx+1, ci, co],  dx = 2B + p - q,
nonzero only when dx in {-1, 0, 1} (half the entries). TORCH padding of 1
packed block column covers the original 1-column padding: the extra
original column it implies is touched only by structurally-zero entries.

No counterpart in the reference (its CUDA backends don't have lane-padding
economics); this is TPU-serving machinery, accepted by measurement
(scripts/microbench_packed_conv.py, docs/PERF.md round 3).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_width(x):
    """(N, H, W, C) -> (N, H, W//2, 2C); channel p*C+c = column 2J+p."""
    n, h, w, c = x.shape
    assert w % 2 == 0, f"width {w} must be even to pack"
    # (N, H, W/2, 2, C): phase as its own axis, then phase-major channels.
    y = x.reshape(n, h, w // 2, 2, c)
    return y.reshape(n, h, w // 2, 2 * c)


def unpack_width(y):
    """Inverse of `pack_width`."""
    n, h, wp, c2 = y.shape
    c = c2 // 2
    return y.reshape(n, h, wp, 2, c).reshape(n, h, wp * 2, c)


def pack_conv_weight_width(w):
    """(kh, 3, cin, cout) stride-1 kernel -> (kh, 3, 2cin, 2cout) packed
    equivalent (50% structured zeros)."""
    kh, kw, cin, cout = w.shape
    assert kw == 3, f"width packing expects 3-wide kernels, got {kw}"
    w = np.asarray(w)
    out = np.zeros((kh, 3, 2 * cin, 2 * cout), w.dtype)
    for q in (0, 1):          # output phase
        for p in (0, 1):      # input phase
            for B in (-1, 0, 1):  # packed block offset
                dx = 2 * B + p - q
                if -1 <= dx <= 1:
                    out[:, B + 1, p * cin:(p + 1) * cin,
                        q * cout:(q + 1) * cout] = w[:, dx + 1]
    return out


def pack_conv_dict_width(p):
    """Pack one conv param dict (float or int8-quantized) for width-packed
    inputs/outputs. Bias and per-channel scales tile across the 2 phases."""
    if "weight_q" in p:
        out = {
            "weight_q": jnp.asarray(
                pack_conv_weight_width(np.asarray(p["weight_q"]))
            ),
            "w_scale": jnp.tile(p["w_scale"], 2),
            "x_scale": p["x_scale"],  # per-tensor: permutation-invariant
        }
        if "bias" in p:
            out["bias"] = jnp.tile(p["bias"], 2)
        return out
    out = {
        "weight": jnp.asarray(
            pack_conv_weight_width(np.asarray(p["weight"]))
        ).astype(p["weight"].dtype)
    }
    if "bias" in p:
        out["bias"] = jnp.tile(p["bias"], 2)
    return out


def pack_hrnet_branch0(params):
    """Serving transform: rewrite every stage module's branch-0 basic-block
    conv (the C=width 3x3s — 8 convs/module x 8 modules on W48) into its
    width-packed equivalent. Run with `HRNetConfig(pack_branch0=True)`;
    `hrnet_apply` then packs branch-0 activations at module boundaries.
    BN must already be folded (the packed dicts carry no BN)."""
    import copy

    params = dict(params)
    for stage in ("stage2", "stage3", "stage4"):
        if stage not in params:
            continue
        params[stage] = copy.copy(params[stage])
        for m in params[stage]:
            mod = copy.copy(params[stage][m])
            branches = copy.copy(mod["branches"])
            blocks = {}
            for l, blk in branches["0"].items():
                b = copy.copy(blk)
                assert "downsample" not in b  # cin==cout in branches
                assert not b.get("bn1") and not b.get("bn2"), (
                    "pack_hrnet_branch0 requires a BN-folded tree"
                )
                b["conv1"] = pack_conv_dict_width(b["conv1"])
                b["conv2"] = pack_conv_dict_width(b["conv2"])
                blocks[l] = b
            branches["0"] = blocks
            mod["branches"] = branches
            params[stage][m] = mod
    return params
