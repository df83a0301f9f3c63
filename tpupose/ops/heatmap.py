"""Heatmap -> keypoint decoding (top-down pose head).

Replaces the torch argmax decode inside the reference's external
`HRNetPose.predict` (`src/ivclabpose.py:208-214`): per-joint argmax over the
(H/4, W/4) heatmap, optional quarter-pixel refinement toward the stronger
neighbor (official HRNet inference trick), then mapping back to full-image
coordinates through the crop box. Fully vectorized over (batch, joints) — no
host round-trip per person.
"""
from __future__ import annotations

import jax.numpy as jnp


def decode_heatmaps(heat, boxes, refine=True):
    """Decode keypoints from heatmaps.

    Args:
      heat: (N, Hh, Wh, J) heatmaps.
      boxes: (N, 4) crop boxes (x0, y0, x1, y1) in image coordinates — the
        region each heatmap corresponds to.
      refine: sub-pixel refinement mode. True / "quarter" = the official
        HRNet quarter-offset toward the stronger neighbor (reference
        parity; default). "parabolic" = 3-point parabola vertex per axis,
        clipped to ±0.5 cell — CONTINUOUS in the heatmap values, so a
        near-tie between the two neighbors (the by-construction state at
        a centered Gaussian peak) cannot flip the refinement by half a
        cell the way the sign-based quarter shift does; measurably more
        accurate on peaky heatmaps and the recommended mode for int8
        serving (docs/PERF.md). False = raw argmax.

    Returns:
      (N, J, 3) keypoints (x_img, y_img, score).
    """
    n, hh, wh, j = heat.shape
    # TPU-shaped argmax: NO flat (N, Hh*Wh, J) reshape (the cross-tile
    # relayout made a single flat max cost ~55 ms/640 crops on v5e vs ~3 ms
    # for two-stage reductions) and NO advanced-index gathers for the
    # neighbors (4 pointwise gathers serialized to ~100 ms/clip — gathers
    # are poison, docs/PERF.md). Row-major argmax semantics are preserved
    # exactly: first row holding the global max, then first column within
    # that row == first flattened index.
    rowmax = jnp.max(heat, axis=2)  # (N, Hh, J)
    score = jnp.max(rowmax, axis=1)  # (N, J)
    h_iota = jnp.arange(hh, dtype=jnp.int32)
    w_iota = jnp.arange(wh, dtype=jnp.int32)
    # argmax ties break to the FIRST index, so argmax(rowmax) then
    # argmax(row content) reproduces flat row-major argmax exactly.
    yi = jnp.argmax(rowmax, axis=1).astype(jnp.int32)  # (N, J)
    row_onehot = h_iota[None, :, None] == yi[:, None, :]  # (N, Hh, J)
    x_at_py = jnp.sum(
        jnp.where(row_onehot[:, :, None, :], heat, 0.0), axis=1
    )  # (N, Wh, J)
    xi = jnp.argmax(x_at_py, axis=1).astype(jnp.int32)  # (N, J)
    py = yi.astype(jnp.float32)
    px = xi.astype(jnp.float32)

    if refine:
        col_onehot = w_iota[None, :, None] == xi[:, None, :]  # (N, Wh, J)
        x_at_px = jnp.sum(
            jnp.where(col_onehot[:, None, :, :], heat, 0.0), axis=2
        )  # (N, Hh, J)

        def pick(vals, iota, pos):
            sel = iota[None, :, None] == pos[:, None, :]
            return jnp.sum(jnp.where(sel, vals, 0.0), axis=1)  # (N, J)

        right = pick(x_at_py, w_iota, xi + 1)
        left = pick(x_at_py, w_iota, xi - 1)
        up = pick(x_at_px, h_iota, yi + 1)
        down = pick(x_at_px, h_iota, yi - 1)
        # Official HRNet refines only when the peak is strictly interior in
        # BOTH axes (1 < p < size-1 check in the official inference code).
        in_x = (xi >= 1) & (xi < wh - 1)
        in_y = (yi >= 1) & (yi < hh - 1)
        interior = in_x & in_y
        if refine == "parabolic":
            # vertex of the parabola through (L, C, R): (R-L)/(2(2C-R-L));
            # the denominator is >= 0 at an argmax, the eps guard covers
            # exact plateaus, the clip covers degenerate near-flat fits.
            # f32: the vertex divides differences of near-equal values,
            # where bf16 cancellation would dominate the offset.
            c = score.astype(jnp.float32)
            r_, l_ = right.astype(jnp.float32), left.astype(jnp.float32)
            u_, d_ = up.astype(jnp.float32), down.astype(jnp.float32)
            dx = (r_ - l_) / (2.0 * jnp.maximum(2.0 * c - r_ - l_, 1e-6))
            dy = (u_ - d_) / (2.0 * jnp.maximum(2.0 * c - u_ - d_, 1e-6))
            px = px + jnp.where(interior, jnp.clip(dx, -0.5, 0.5), 0.0)
            py = py + jnp.where(interior, jnp.clip(dy, -0.5, 0.5), 0.0)
        else:
            px = px + jnp.where(interior, 0.25 * jnp.sign(right - left), 0.0)
            py = py + jnp.where(interior, 0.25 * jnp.sign(up - down), 0.0)

    x0, y0 = boxes[:, 0:1], boxes[:, 1:2]
    bw = boxes[:, 2:3] - boxes[:, 0:1]
    bh = boxes[:, 3:4] - boxes[:, 1:2]
    x_img = x0 + px / wh * bw
    y_img = y0 + py / hh * bh
    return jnp.stack([x_img, y_img, score], axis=-1)


def decode_heatmaps_auto(heat, boxes, refine=True, force_pallas=False):
    """Decode dispatch point for the production pipelines.

    Both implementations have identical semantics (argmax ties break to the
    first row-major index; `tests/test_pallas_heatmap.py` pins equality, and
    they matched bit-exactly on a real v5e). MEASURED on v5e at the bench
    shape (640, 96, 72, 17): XLA decode 13 ms, Pallas fused kernel 101 ms —
    Mosaic's per-program overhead over a 640-crop grid dominates the single
    VMEM pass it saves, and multi-crop (4-D) blocks fail Mosaic layout
    assignment. XLA's fused reduce is already near bandwidth-bound, so it
    stays the default; the Pallas kernel remains available (force_pallas)
    as the substrate for a future fully-fused pose head."""
    if force_pallas:
        if refine == "parabolic":
            raise ValueError(
                "the Pallas decode implements only the quarter-offset "
                "refinement; use the XLA decode for refine='parabolic'"
            )
        from tpupose.ops.pallas_heatmap import decode_heatmaps_pallas

        return decode_heatmaps_pallas(heat, boxes, refine=refine)
    return decode_heatmaps(heat, boxes, refine=refine)


def expand_box_to_aspect(boxes, aspect_h_over_w):
    """Grow boxes (centered) to the model aspect ratio (h/w).

    The reference's top-down backend fits each detection crop to the HRNet
    input ratio (384/288 = 4/3) before resizing; growing (never shrinking)
    keeps the whole person visible.
    """
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = x1 - x0
    h = y1 - y0
    cx = (x0 + x1) / 2
    cy = (y0 + y1) / 2
    target_h = jnp.maximum(h, w * aspect_h_over_w)
    target_w = target_h / aspect_h_over_w
    return jnp.stack(
        [cx - target_w / 2, cy - target_h / 2, cx + target_w / 2, cy + target_h / 2],
        axis=1,
    )
