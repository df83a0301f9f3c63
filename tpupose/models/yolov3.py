"""YOLOv3 person detector in JAX (NHWC).

Re-implementation of the reference's external darknet YOLOv3 backend
(cfg/weights at `src/configs/*/model_configs.yaml:38-45`, consumed at
`src/ivclabpose.py:116-119,183-206`): Darknet-53 backbone, 3 detection
scales with the standard COCO anchors, person-class filtering with
SCORE_THRESH=0.5 and NMS_THRESH=0.4.

Convolutions are kept in darknet file order (`conv0` .. `conv74`) so the
`.weights` binary converter (`tpupose.models.convert`) is a sequential read.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpupose.models.layers import (
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    leaky_relu,
    upsample_nearest,
)
from tpupose.ops.nms import nms

#: (out_channels, kernel, stride, batchnorm) in darknet cfg order. Residual
#: adds and routes are reconstructed in `yolov3_apply`.
def _conv_specs(num_classes=80, width_mult=1.0):
    def c(ch):
        return max(int(ch * width_mult), 1)

    spec = []

    def conv(ch, k, s, bn=True):
        spec.append((c(ch) if bn else ch, k, s, bn))

    def res_block(ch, n):
        for _ in range(n):
            conv(ch // 2, 1, 1)
            conv(ch, 3, 1)

    out_ch = 3 * (5 + num_classes)
    conv(32, 3, 1)
    conv(64, 3, 2); res_block(64, 1)
    conv(128, 3, 2); res_block(128, 2)
    conv(256, 3, 2); res_block(256, 8)      # conv25 out -> route (stride 8)
    conv(512, 3, 2); res_block(512, 8)      # conv42 out -> route (stride 16)
    conv(1024, 3, 2); res_block(1024, 4)    # conv51 out (stride 32)
    # head scale 1 (stride 32)
    conv(512, 1, 1); conv(1024, 3, 1); conv(512, 1, 1)
    conv(1024, 3, 1); conv(512, 1, 1)       # conv56 -> branch A
    conv(1024, 3, 1)
    spec.append((out_ch, 1, 1, False))      # conv58: detection
    conv(256, 1, 1)                          # conv59 on branch A, then upsample
    # head scale 2 (stride 16), input concat(conv59^up, conv42)
    conv(256, 1, 1); conv(512, 3, 1); conv(256, 1, 1)
    conv(512, 3, 1); conv(256, 1, 1)        # conv64 -> branch B
    conv(512, 3, 1)
    spec.append((out_ch, 1, 1, False))      # conv66: detection
    conv(128, 1, 1)                          # conv67 on branch B, then upsample
    # head scale 3 (stride 8), input concat(conv67^up, conv25)
    conv(128, 1, 1); conv(256, 3, 1); conv(128, 1, 1)
    conv(256, 3, 1); conv(128, 1, 1)
    conv(256, 3, 1)
    spec.append((out_ch, 1, 1, False))      # conv74: detection
    return spec


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 80
    input_size: int = 416
    score_thresh: float = 0.5
    nms_thresh: float = 0.4
    max_candidates: int = 64  # top-K person candidates fed to NMS
    width_mult: float = 1.0   # channel scale (1.0 = real yolov3; tests shrink)
    #: Preprocessing geometry. False = plain resize to (S, S), matching the
    #: reference's shipped backend (ZQPei/deep_sort_pytorch YOLOv3
    #: `__call__` does a plain cv2.resize); True = darknet letterbox
    #: (aspect-preserving + neutral padding) for weights evaluated that way.
    letterbox: bool = False

    @property
    def anchors(self):
        # (scale, anchor, wh) in input pixels; scale order: stride 32, 16, 8.
        return (
            ((116, 90), (156, 198), (373, 326)),
            ((30, 61), (62, 45), (59, 119)),
            ((10, 13), (16, 30), (33, 23)),
        )

    @property
    def conv_specs(self):
        return _conv_specs(self.num_classes, self.width_mult)


def tiny_yolo_test_config():
    return YoloConfig(num_classes=2, input_size=64, width_mult=1 / 16,
                      max_candidates=16)


def conv_in_channels(cfg: YoloConfig):
    """Input channels per conv index (shared by init and the .weights
    converter, which must produce identically-shaped tensors)."""
    specs = cfg.conv_specs
    cins = []
    cin = 3
    for i, (cout, k, s, bn) in enumerate(specs):
        # concat routes change cin for convs 60 and 68
        if i == 60:
            cin = specs[59][0] + specs[42][0]
        elif i == 68:
            cin = specs[67][0] + specs[25][0]
        cins.append(cin)
        cin = cout
        if i == 58:
            cin = specs[56][0]  # route back to branch A
        elif i == 66:
            cin = specs[64][0]  # route back to branch B
    return cins


def yolov3_init(key, cfg: YoloConfig):
    specs = cfg.conv_specs
    cins = conv_in_channels(cfg)
    keys = jax.random.split(key, len(specs))
    params = {}
    for i, ((cout, k, s, bn), cin) in enumerate(zip(specs, cins)):
        p = {"conv": conv_init(keys[i], k, k, cin, cout, bias=not bn)}
        if bn:
            p["bn"] = bn_init(cout)
        params[f"conv{i}"] = p
    return params


def _conv(params, i, x, specs):
    cout, k, s, bn = specs[i]
    p = params[f"conv{i}"]
    y = conv_apply(p["conv"], x, stride=s)  # TORCH padding == darknet pad=k//2
    if bn:
        y = leaky_relu(bn_apply(p["bn"], y))
    return y


def yolov3_apply(params, cfg: YoloConfig, x, compute_dtype=jnp.bfloat16):
    """Backbone + heads. x: (N, S, S, 3) in [0, 1]. Returns raw head outputs
    [(N, S/32, S/32, A*(5+C)), (stride 16), (stride 8)] in f32."""
    specs = cfg.conv_specs
    x = x.astype(compute_dtype)

    def run(i, x):
        return _conv(params, i, x, specs)

    i = 0
    x = run(0, x)
    routes = {}

    def res_chain(x, i, n):
        for _ in range(n):
            y = run(i, x)
            y = run(i + 1, y)
            x = x + y
            i += 2
        return x, i

    x = run(1, x); x, i = res_chain(x, 2, 1)
    x = run(i, x); x, i = res_chain(x, i + 1, 2)
    x = run(i, x); x, i = res_chain(x, i + 1, 8)
    routes[25] = x
    x = run(i, x); x, i = res_chain(x, i + 1, 8)
    routes[42] = x
    x = run(i, x); x, i = res_chain(x, i + 1, 4)
    assert i == 52, i

    for j in range(52, 57):
        x = run(j, x)
    branch_a = x
    det1 = run(58, run(57, x))

    x = run(59, branch_a)
    x = upsample_nearest(x, 2)
    x = jnp.concatenate([x, routes[42]], axis=-1)
    for j in range(60, 65):
        x = run(j, x)
    branch_b = x
    det2 = run(66, run(65, x))

    x = run(67, branch_b)
    x = upsample_nearest(x, 2)
    x = jnp.concatenate([x, routes[25]], axis=-1)
    for j in range(68, 73):
        x = run(j, x)
    det3 = run(74, run(73, x))

    return [d.astype(jnp.float32) for d in (det1, det2, det3)]


def decode_detections(cfg: YoloConfig, heads, class_id=0):
    """Decode raw head outputs into (boxes, scores) for one class.

    Returns:
      boxes: (N, P, 4) (x0, y0, x1, y1) in input-pixel coordinates.
      scores: (N, P) objectness * class probability.
    """
    size = cfg.input_size
    all_boxes, all_scores = [], []
    for head, anchors in zip(heads, cfg.anchors):
        n, gh, gw, _ = head.shape
        stride = size // gw
        a = len(anchors)
        head = head.reshape(n, gh, gw, a, 5 + cfg.num_classes)
        cy = jnp.arange(gh, dtype=jnp.float32)[None, :, None, None]
        cx = jnp.arange(gw, dtype=jnp.float32)[None, None, :, None]
        bx = (jax.nn.sigmoid(head[..., 0]) + cx) * stride
        by = (jax.nn.sigmoid(head[..., 1]) + cy) * stride
        aw = jnp.array([w for w, h in anchors], jnp.float32)[None, None, None, :]
        ah = jnp.array([h for w, h in anchors], jnp.float32)[None, None, None, :]
        bw = jnp.exp(head[..., 2]) * aw
        bh = jnp.exp(head[..., 3]) * ah
        obj = jax.nn.sigmoid(head[..., 4])
        cls = jax.nn.sigmoid(head[..., 5 + class_id])
        boxes = jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1
        )
        all_boxes.append(boxes.reshape(n, -1, 4))
        all_scores.append((obj * cls).reshape(n, -1))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


def prepare_yolo_images(cfg: YoloConfig, x):
    """(N, H, W, 3) floats in [0, 1] -> (N, S, S, 3) network input, honoring
    cfg.letterbox. Kept next to `yolo_box_mapping` so the geometry and its
    inverse cannot drift."""
    from tpupose.ops.image import letterbox_resize, resize_bilinear

    s = cfg.input_size
    if cfg.letterbox:
        return letterbox_resize(x, s, fill=0.5)
    return resize_bilinear(x, (s, s))


def yolo_box_mapping(cfg: YoloConfig, image_hw):
    """Input-pixel -> original-image box mapping as (scale4, offset4) so
    that orig = (box_in_input - offset) * scale, for both preprocessing
    geometries."""
    oh, ow = image_hw
    s = cfg.input_size
    if cfg.letterbox:
        r = min(s / oh, s / ow)
        nh, nw = round(oh * r), round(ow * r)
        top, left = (s - nh) // 2, (s - nw) // 2
        scale = jnp.full((4,), 1.0 / r, jnp.float32)
        offset = jnp.array([left, top, left, top], jnp.float32)
    else:
        scale = jnp.array([ow / s, oh / s] * 2, jnp.float32)
        offset = jnp.zeros((4,), jnp.float32)
    return scale, offset


def detect_people(params, cfg: YoloConfig, images, image_hw):
    """Full person detection: forward + decode + top-K + NMS.

    Args:
      images: (N, S, S, 3) in [0, 1], produced by `prepare_yolo_images`
        (plain resize by default — the reference backend's preprocessing;
        letterbox when cfg.letterbox).
      image_hw: (orig_h, orig_w) for scaling boxes back.

    Returns:
      boxes: (N, K, 4) in original-image pixels (clipped), scores: (N, K),
      valid: (N, K) bool.
    """
    heads = yolov3_apply(params, cfg, images)
    boxes, scores = decode_detections(cfg, heads)
    k = cfg.max_candidates
    top_scores, idx = jax.lax.top_k(scores, k)  # (N, K)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    valid = top_scores > cfg.score_thresh

    def per_image(b, s, v):
        keep = nms(b, s, v, cfg.nms_thresh)
        return keep

    keep = jax.vmap(per_image)(top_boxes, top_scores, valid)
    oh, ow = image_hw
    scale, offset = yolo_box_mapping(cfg, image_hw)
    out_boxes = (top_boxes - offset) * scale
    # Clip to image bounds (reference clamps at src/ivclabpose.py:190-194).
    out_boxes = jnp.clip(
        out_boxes,
        jnp.zeros(4),
        jnp.array([ow, oh, ow, oh], jnp.float32),
    )
    return out_boxes, top_scores, valid & keep
