"""Device mesh construction and sharding helpers.

Parallelism design (SURVEY.md §2.4 — all new; the reference is single-GPU):
  * `data` axis: batch/data parallelism over detection+pose crops and over
    independent video streams (stream parallelism — the tracker is a per-
    stream recurrence, so streams, not sequence, is the scaling axis).
  * `model` axis: tensor parallelism over conv output channels for the
    HRNet/YOLO backbones (useful at large per-chip batch; defaults to 1).
Pipeline/expert parallelism are not applicable to these small convnets — the
whole W48 fits per chip with room to spare; we scale out, not across.
Collectives ride ICI via XLA's SPMD partitioner (psum for gradients and
metric reductions); no hand-written NCCL-style code, per the TPU-first rule.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard one array dimension over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of arrays with axis-0 'data' sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )


def conv_param_sharding(mesh: Mesh, params, min_channels: int = 16):
    """Tensor-parallel sharding rule for conv param trees.

    Conv kernels (H, W, I, O) with O divisible by the 'model' axis and
    O >= min_channels shard on output channels; their BN/bias vectors follow.
    Everything else is replicated. XLA's SPMD partitioner inserts the
    resharding collectives between layers.
    """
    mp = mesh.shape["model"]

    def rule(x):
        if x.ndim == 4 and x.shape[3] % mp == 0 and x.shape[3] >= min_channels:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if x.ndim == 1 and x.shape[0] % mp == 0 and x.shape[0] >= min_channels:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
