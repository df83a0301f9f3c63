"""Pallas TPU kernel: fused heatmap -> keypoint decoding.

One VMEM-resident pass per crop computes, for every joint: the peak score,
its (x, y) argmax, and the quarter-pixel refinement from the four neighbors
(BASELINE.json north star: "Pallas-fused ... heatmap-argmax keypoint
decoding"). The pure-XLA decode (`tpupose.ops.heatmap.decode_heatmaps`)
re-reads the heatmap tensor for max, argmax and the neighbor gathers; this
kernel reads it once.

Mosaic notes: everything is kept rank >= 2 ((J, H), (J, W), (J, 1) shapes —
rank-1 intermediates trip TPU layout assignment), argmax is expressed as
masked iota-min (first row achieving the max, then first column within that
row — exactly XLA argmax's row-major tie-breaking), and the four neighbor
reads become masked reductions instead of rolls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(h_ref, out_ref, *, refine: bool):
    x = h_ref[0].astype(jnp.float32)  # (J, H, W)
    j, hh, wh = x.shape
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (j, hh), 1)  # (J, H)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (j, wh), 1)  # (J, W)

    rowmax = jnp.max(x, axis=2)  # (J, H)
    # Two-stage reduction: a single multi-axis reduce trips Mosaic layout
    # assignment on TPU (rank-1 implicit-dim check).
    score = jnp.max(rowmax, axis=1, keepdims=True)  # (J, 1)
    py = jnp.min(
        jnp.where(rowmax >= score, h_iota, hh), axis=1, keepdims=True
    )  # (J, 1) first row holding the global max
    row_mask = (h_iota == py).astype(jnp.float32)  # (J, H)
    x_at_py = jnp.sum(x * row_mask[:, :, None], axis=1)  # (J, W)
    px = jnp.min(
        jnp.where(x_at_py >= score, w_iota, wh), axis=1, keepdims=True
    )  # (J, 1) first column in that row

    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)

    if refine:
        col_mask = (w_iota == px).astype(jnp.float32)  # (J, W)
        x_at_px = jnp.sum(x * col_mask[:, None, :], axis=2)  # (J, H)

        def pick(vals, iota, idx):
            sel = (iota == idx).astype(jnp.float32)
            return jnp.sum(vals * sel, axis=1, keepdims=True)  # (J, 1)

        right = pick(x_at_py, w_iota, px + 1)
        left = pick(x_at_py, w_iota, px - 1)
        up = pick(x_at_px, h_iota, py + 1)
        down = pick(x_at_px, h_iota, py - 1)
        interior = (
            (px >= 1) & (px < wh - 1) & (py >= 1) & (py < hh - 1)
        )
        pxf = pxf + jnp.where(interior, 0.25 * jnp.sign(right - left), 0.0)
        pyf = pyf + jnp.where(interior, 0.25 * jnp.sign(up - down), 0.0)

    out_ref[0] = jnp.concatenate([pxf, pyf, score], axis=1)  # (J, 3)


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
