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
import optax

from tpupose.models.hrnet import HRNetConfig, hrnet_apply


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
                 compute_dtype=jnp.bfloat16):
    """Joint-weighted MSE (standard JointsMSELoss)."""
    pred = hrnet_apply(params, cfg, images, compute_dtype)
    err = (pred - targets) ** 2  # (N, Hh, Wh, J)
    per_joint = jnp.mean(err, axis=(1, 2))  # (N, J)
    return jnp.mean(per_joint * weights)


def make_optimizer(lr=1e-3, weight_decay=1e-4):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: HRNetConfig, optimizer, compute_dtype=jnp.bfloat16):
    """jittable (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, images, targets, weights):
        loss, grads = jax.value_and_grad(heatmap_loss)(
            params, cfg, images, targets, weights, compute_dtype
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_train_step(cfg: HRNetConfig, optimizer, mesh,
                            compute_dtype=jnp.float32):
    """Train step jitted over a ('data', 'model') mesh.

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

    step = make_train_step(cfg, optimizer, compute_dtype)
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
