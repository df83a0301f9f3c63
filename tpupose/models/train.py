"""Training step for the 2D pose backbone (heatmap regression).

The reference has no training code (SURVEY.md: inference-only); this module
adds standard top-down pose fine-tuning so converted checkpoints can be
adapted on-TPU: MSE over per-joint Gaussian target heatmaps with per-joint
visibility weights, AdamW, frozen BN statistics (`tpupose.models.layers.
bn_apply` is inference-mode; gradients flow through the affine terms).

Scaling: data parallelism over the crop batch + optional tensor parallelism
over conv channels (`tpupose.parallel.mesh.conv_param_sharding`); gradient
psum is inserted by XLA from the sharding annotations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpupose.models.hrnet import HRNetConfig, hrnet_apply

#: 17 visually distinct RGB colors, one per joint — makes joint identity
#: learnable from color alone in the blob-localization task.
JOINT_COLORS = np.array(
    [
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
        [128, 128, 0],
    ],
    np.float32,
)


def blob_localization_batch(rng, cfg: HRNetConfig, n, blob_sigma=2.5):
    """Synthetic pose-localization batch: each joint is a distinct-colored
    Gaussian blob at a random position. The ONLY supervised task available
    in an environment with no datasets — used by the int8 accuracy tests
    (tiny scale) and `scripts/int8_w48_agreement.py` (full W48 scale) to
    obtain genuinely LEARNED, peaky heatmaps.

    Returns (images (n,H,W,3) in [0,1], keypoints (n,J,3) crop px)."""
    h, w = cfg.input_size
    imgs = np.full((n, h, w, 3), 0.35, np.float32)
    kps = np.zeros((n, cfg.num_joints, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        for j in range(cfg.num_joints):
            x = rng.uniform(6, w - 6)
            y = rng.uniform(6, h - 6)
            kps[i, j] = (x, y, 1.0)
            blob = np.exp(
                -((xx - x) ** 2 + (yy - y) ** 2) / (2 * blob_sigma**2)
            )
            color = JOINT_COLORS[j % len(JOINT_COLORS)]
            imgs[i] += blob[..., None] * (color / 255.0 - 0.35)
    return jnp.asarray(np.clip(imgs, 0, 1)), jnp.asarray(kps)


def gaussian_target_heatmaps(cfg: HRNetConfig, keypoints_crop, sigma=2.0):
    """Target heatmaps from keypoints in crop pixel coordinates.

    Args:
      keypoints_crop: (N, J, 3) (x, y, vis) in crop coordinates.
    Returns:
      heatmaps (N, Hh, Wh, J), weights (N, J).
    """
    hh, wh = cfg.heatmap_size
    xs = jnp.arange(wh, dtype=jnp.float32)
    ys = jnp.arange(hh, dtype=jnp.float32)
    kx = keypoints_crop[..., 0] / 4.0  # heatmap stride 4
    ky = keypoints_crop[..., 1] / 4.0
    gx = jnp.exp(-0.5 * ((xs[None, None, :] - kx[..., None]) / sigma) ** 2)
    gy = jnp.exp(-0.5 * ((ys[None, None, :] - ky[..., None]) / sigma) ** 2)
    heat = gy[:, :, :, None] * gx[:, :, None, :]  # (N, J, Hh, Wh)
    weights = (keypoints_crop[..., 2] > 0).astype(jnp.float32)
    return jnp.transpose(heat, (0, 2, 3, 1)), weights


def heatmap_loss(params, cfg: HRNetConfig, images, targets, weights,
                 compute_dtype=jnp.bfloat16, train_bn=False):
    """Joint-weighted MSE (standard JointsMSELoss).

    `train_bn` runs BatchNorms in TRAIN mode (normalize by the current
    batch statistics — the `BNStatRecorder` switch in `bn_apply`,
    activated here at trace time). Required when training at real depth:
    inference-mode BN with raw init stats lets residual stacks double
    activation variance per block, and inference-mode BN with
    pre-calibrated stats scales gradients by tiny 1/sqrt(running_var)
    factors — measured 2026-08-17 at the full (1,4,3)x4 schedule, decode
    error frozen at the constant-prediction baseline for 800+ steps.
    After training, write coherent running stats with
    `quantize.calibrate_bn_stats` before folding/serving."""
    if train_bn:
        from tpupose.models.layers import BNStatRecorder

        prev, BNStatRecorder.active = BNStatRecorder.active, BNStatRecorder()
        try:
            pred = hrnet_apply(params, cfg, images, compute_dtype)
        finally:
            BNStatRecorder.active = prev
    else:
        pred = hrnet_apply(params, cfg, images, compute_dtype)
    err = (pred - targets) ** 2  # (N, Hh, Wh, J)
    per_joint = jnp.mean(err, axis=(1, 2))  # (N, J)
    return jnp.mean(per_joint * weights)


def make_optimizer(lr=1e-3, weight_decay=1e-4):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: HRNetConfig, optimizer, compute_dtype=jnp.bfloat16,
                    train_bn=False):
    """jittable (params, opt_state, batch) -> (params, opt_state, loss).

    With `train_bn`, BN layers normalize by batch statistics (see
    `heatmap_loss`); the running-stat leaves get zero gradients (unused
    in the forward) and stay at their init values — re-estimate them
    with `calibrate_bn_stats` after training."""

    def step(params, opt_state, images, targets, weights):
        loss, grads = jax.value_and_grad(heatmap_loss)(
            params, cfg, images, targets, weights, compute_dtype, train_bn
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_train_step(cfg: HRNetConfig, optimizer, mesh,
                            compute_dtype=jnp.float32, train_bn=False):
    """Train step jitted over a ('data', 'model') mesh.

    With `train_bn`, BN batch statistics reduce over the FULL data-sharded
    batch — XLA's SPMD partitioner turns the jnp.mean/var over the batch
    axis into cross-shard psums, i.e. synchronized BatchNorm for free.

    Batch arrays shard on axis 0 over 'data'; params and optimizer state
    shard per `conv_param_sharding` (TP over conv output channels where
    divisible — the rule is shape-based, so Adam's mu/nu mirrors pick up the
    same placement and its scalar count stays replicated). The jit carries
    explicit in/out shardings, so gradient psums and any boundary reshards
    are inserted by XLA's SPMD partitioner.

    Returns (sharded_step, shardings_for): call `shardings_for(params)` to
    `device_put` params before the first step; `sharded_step` jits lazily on
    first call (it needs the concrete param/opt-state trees for shardings).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from tpupose.parallel.mesh import conv_param_sharding

    step = make_train_step(cfg, optimizer, compute_dtype, train_bn)
    batch_s = NamedSharding(mesh, PartitionSpec("data"))
    scalar_s = NamedSharding(mesh, PartitionSpec())
    cache = {}

    def sharded(params, opt_state, images, targets, weights):
        if "fn" not in cache:
            ps = conv_param_sharding(mesh, params)
            os_ = conv_param_sharding(mesh, opt_state)
            cache["fn"] = jax.jit(
                step,
                in_shardings=(ps, os_, batch_s, batch_s, batch_s),
                out_shardings=(ps, os_, scalar_s),
            )
        return cache["fn"](params, opt_state, images, targets, weights)

    def shardings_for(params):
        return conv_param_sharding(mesh, params)

    return sharded, shardings_for
