"""Pallas TPU kernel: fused heatmap -> keypoint decoding.

One VMEM-resident pass per crop computes, for every joint: the peak score,
its (x, y) argmax, and the quarter-pixel refinement from the four neighbors
(BASELINE.json north star: "Pallas-fused ... heatmap-argmax keypoint
decoding"). The pure-XLA decode (`tpupose.ops.heatmap.decode_heatmaps`)
re-reads the heatmap tensor for max, argmax and the neighbor gathers; this
kernel reads it once.

Layout: heatmaps arrive as (N, Hh, Wh, J) from the conv head and are
transposed to (N, J, Hh, Wh) so the reduction lanes are the W dimension
(J=17 would waste 111 of 128 lanes). Grid is one program per crop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(h_ref, out_ref, *, refine: bool):
    x = h_ref[0]  # (J, H, W)
    j, hh, wh = x.shape
    score = jnp.max(x, axis=(1, 2))  # (J,)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (j, hh, wh), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (j, hh, wh), 2)
    lin = row_ids * wh + col_ids
    is_peak = x >= score[:, None, None]
    first = jnp.min(jnp.where(is_peak, lin, hh * wh), axis=(1, 2))  # (J,)
    py = (first // wh).astype(jnp.float32)
    px = (first % wh).astype(jnp.float32)

    if refine:
        onehot = lin == first[:, None, None]

        def peak_neighbor(dy, dx):
            # pltpu.roll needs non-negative shifts: roll(-d) == roll(S - d).
            shifted = x
            if dy:
                shifted = pltpu.roll(shifted, (-dy) % hh, 1)
            if dx:
                shifted = pltpu.roll(shifted, (-dx) % wh, 2)
            return jnp.sum(jnp.where(onehot, shifted, 0.0), axis=(1, 2))

        right = peak_neighbor(0, 1)
        left = peak_neighbor(0, -1)
        up = peak_neighbor(1, 0)
        down = peak_neighbor(-1, 0)
        interior = (px >= 1) & (px < wh - 1) & (py >= 1) & (py < hh - 1)
        px = px + jnp.where(interior, 0.25 * jnp.sign(right - left), 0.0)
        py = py + jnp.where(interior, 0.25 * jnp.sign(up - down), 0.0)

    out_ref[0, :, 0] = px
    out_ref[0, :, 1] = py
    out_ref[0, :, 2] = score


def decode_heatmaps_pallas(heat, boxes, refine=True, interpret=False):
    """Pallas-fused equivalent of `tpupose.ops.heatmap.decode_heatmaps`.

    Args:
      heat: (N, Hh, Wh, J) heatmaps.
      boxes: (N, 4) crop boxes (x0, y0, x1, y1) in image coordinates.
      interpret: run in interpreter mode (for CPU tests).

    Returns:
      (N, J, 3) keypoints (x_img, y_img, score).
    """
    n, hh, wh, j = heat.shape
    ht = jnp.transpose(heat, (0, 3, 1, 2)).astype(jnp.float32)  # (N, J, H, W)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, refine=refine),
        out_shape=jax.ShapeDtypeStruct((n, j, 3), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, j, hh, wh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, j, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ht)
    px, py, score = out[..., 0], out[..., 1], out[..., 2]
    x0, y0 = boxes[:, 0:1], boxes[:, 1:2]
    bw = boxes[:, 2:3] - boxes[:, 0:1]
    bh = boxes[:, 3:4] - boxes[:, 1:2]
    x_img = x0 + px / wh * bw
    y_img = y0 + py / hh * bh
    return jnp.stack([x_img, y_img, score], axis=-1)
