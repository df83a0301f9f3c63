"""On-device image ops: batched crop-and-resize, full-frame resize.

The reference does all cropping/resizing on host with cv2/torchvision inside
its backends; here the crops for every detection of every view run on device,
feeding the HRNet batch directly (BASELINE.json north-star: fused preprocess).

TPU performance: bilinear resampling is expressed as two MATMULS per crop —
out = W_y @ img @ W_x^T with (out_h, H) / (out_w, W) interpolation-weight
matrices built on the fly from the box coordinates. Arbitrary-index gathers
are catastrophically slow on TPU (~86 ms for 20 crops measured on v5e); the
separable-matmul form rides the MXU instead (~60 GFLOPs for 20 384x288
crops, <1 ms).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_weight_matrix(src_coords, src_size):
    """(out,) float source coordinates -> (out, src_size) bilinear weights.

    Each row has at most two non-zeros: w[o, floor(c)] = 1 - frac,
    w[o, floor(c)+1] = frac, with edge clamping (replicated border).
    """
    c = jnp.clip(src_coords, 0.0, src_size - 1.0)
    i = jnp.arange(src_size, dtype=jnp.float32)
    # weight = max(0, 1 - |c - i|) gives exactly the two bilinear taps.
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - i[None, :]))


def _resample_matmul(img, ys, xs):
    """Separable bilinear resample of img (H, W, C) at row coords ys (out_h,)
    and col coords xs (out_w,), as two matmuls.

    Computes in the image's dtype when floating (bf16 images keep the whole
    resample in bf16 — halves HBM traffic; the MXU accumulates in f32 either
    way). Integer images promote to f32: fractional bilinear weights would
    truncate to 0/1 in an integer dtype."""
    h, w, _ = img.shape
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    img = img.astype(dt)
    wy = _bilinear_weight_matrix(ys, h).astype(dt)  # (out_h, H)
    wx = _bilinear_weight_matrix(xs, w).astype(dt)  # (out_w, W)
    # (out_h, H) @ (H, W*C) -> (out_h, W, C); then contract W with wx.
    tmp = jnp.einsum("oh,hwc->owc", wy, img)
    return jnp.einsum("pw,owc->opc", wx, tmp)


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
        return _resample_matmul(image, ys, xs)

    return jax.vmap(one)(boxes)


def letterbox_resize(image, out_size, fill=0.5):
    """Aspect-preserving resize onto an (out_size, out_size) canvas.

    Darknet-style letterbox: scale by min(out/h, out/w), center, pad with a
    neutral fill (darknet uses 128/255). The reference's shipped backend
    (ZQPei/deep_sort_pytorch YOLOv3) uses a PLAIN cv2.resize, so plain
    `resize_bilinear` is the parity default; this exists for weights trained
    with letterbox preprocessing (original darknet eval). Box back-mapping
    lives in `tpupose.models.yolov3.yolo_box_mapping`.

    Args:
      image: (N, H, W, C) or (H, W, C) float in [0, 1].
    Returns:
      (N, out_size, out_size, C) (or unbatched).
    """
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    n, h, w, c = image.shape
    scale = min(out_size / h, out_size / w)
    nh, nw = round(h * scale), round(w * scale)
    resized = resize_bilinear(image, (nh, nw))
    top = (out_size - nh) // 2
    left = (out_size - nw) // 2
    out = jnp.full((n, out_size, out_size, c), fill, resized.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, top, left, 0))
    return out if batched else out[0]


def resize_bilinear(image, out_hw):
    """Full-image bilinear resize (N, H, W, C) or (H, W, C).

    Matches cv2.resize / jax.image.resize 'bilinear' (half-pixel centers),
    implemented as separable weight matmuls (see module docstring).
    """
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    n, h, w, c = image.shape
    out_h, out_w = out_hw
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    out = jax.vmap(lambda img: _resample_matmul(img, ys, xs))(image)
    return out if batched else out[0]
