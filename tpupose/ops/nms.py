"""Jittable greedy non-maximum suppression over fixed-size candidate sets.

Replaces the torch NMS inside the reference's external YOLOv3 backend
(NMS_THRESH=0.4, `src/configs/*/model_configs.yaml:45`). Operates on a fixed
K candidates with validity masks so it composes with jit/vmap/scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU for (N, 4) x (M, 4) boxes (x0, y0, x1, y1)."""
    ax0, ay0, ax1, ay1 = [boxes_a[:, i] for i in range(4)]
    bx0, by0, bx1, by1 = [boxes_b[:, i] for i in range(4)]
    ix0 = jnp.maximum(ax0[:, None], bx0[None, :])
    iy0 = jnp.maximum(ay0[:, None], by0[None, :])
    ix1 = jnp.minimum(ax1[:, None], bx1[None, :])
    iy1 = jnp.minimum(ay1[:, None], by1[None, :])
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    area_a = jnp.clip(ax1 - ax0, 0) * jnp.clip(ay1 - ay0, 0)
    area_b = jnp.clip(bx1 - bx0, 0) * jnp.clip(by1 - by0, 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.where(union == 0, 1.0, union)


def nms(boxes, scores, valid, iou_thresh):
    """Greedy NMS.

    Args:
      boxes: (K, 4); scores: (K,); valid: (K,) bool; iou_thresh: float.

    Returns:
      keep: (K,) bool — surviving boxes (in original index order).
    """
    k = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]
    iou = iou_matrix(b, b)

    def body(i, state):
        keep, suppressed = state
        take = v[i] & ~suppressed[i]
        keep = keep.at[i].set(take)
        suppressed = suppressed | (take & (iou[i] > iou_thresh))
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, k, body, (jnp.zeros(k, bool), jnp.zeros(k, bool))
    )
    # Scatter back to original order.
    keep = jnp.zeros(k, bool).at[order].set(keep_sorted)
    return keep
