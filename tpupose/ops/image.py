"""On-device image ops: batched crop-and-resize, full-frame resize.

The reference does all cropping/resizing on host with cv2/torchvision inside
its backends; here the crops for every detection of every view are one
vmapped bilinear gather on device, feeding the HRNet batch directly
(BASELINE.json north-star: fused preprocess).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(img, ys, xs):
    """Sample img (H, W, C) at float coords (edge-clamped). ys/xs: (...,)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def crop_and_resize(image, boxes, out_hw):
    """Crop boxes from one image and resize bilinearly (cv2-style mapping).

    Args:
      image: (H, W, C) float array.
      boxes: (N, 4) (x0, y0, x1, y1) in pixel coordinates (may exceed the
        image; sampling edge-clamps).
      out_hw: static (out_h, out_w).

    Returns:
      (N, out_h, out_w, C)
    """
    out_h, out_w = out_hw
    gy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    gx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w

    def one(box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        ys = y0 + gy * (y1 - y0) - 0.5
        xs = x0 + gx * (x1 - x0) - 0.5
        yy = jnp.broadcast_to(ys[:, None], (out_h, out_w))
        xx = jnp.broadcast_to(xs[None, :], (out_h, out_w))
        return _bilinear_sample(image, yy, xx)

    return jax.vmap(one)(boxes)


def resize_bilinear(image, out_hw):
    """Full-image bilinear resize (N, H, W, C) or (H, W, C)."""
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    n, h, w, c = image.shape
    out = jax.image.resize(image, (n, out_hw[0], out_hw[1], c), method="bilinear")
    return out if batched else out[0]
