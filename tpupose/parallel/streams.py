"""Multi-stream tracking: the throughput mode (BASELINE.json config 5).

The tracker is an O(1)-state per-frame recurrence — sequence parallelism
doesn't apply (SURVEY.md §5); instead we scale by running MANY independent
video streams at once: tracker state and detections get a leading stream
axis, the step is vmapped over it, and the stream axis is sharded over the
mesh's 'data' axis so each chip tracks its own subset with zero cross-chip
traffic (metric reductions psum over ICI at harvest time only).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupose.geometry import CameraSet
from tpupose.tracking.tracker import (
    TrackerConfig,
    TrackerState,
    init_state,
    tracker_step,
)


def init_multistream_state(cfg: TrackerConfig, num_streams: int) -> TrackerState:
    """TrackerState with a leading stream axis."""
    one = init_state(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_streams,) + x.shape), one
    )


def multistream_step(cfg: TrackerConfig, cams: CameraSet, state, dets, mask,
                     frame_ids):
    """vmapped tracker step.

    Args:
      cams: CameraSet with a leading stream axis on every field.
      state: TrackerState with a leading stream axis.
      dets: (S, C, D, J, 3); mask: (S, C, D); frame_ids: (S,).
    """
    return jax.vmap(partial(tracker_step, cfg))(cams, state, dets, mask, frame_ids)


def shard_streams(mesh, tree):
    """Shard a stream-major pytree's leading axis over the 'data' mesh axis."""
    from tpupose.parallel.mesh import data_sharding

    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree
    )


def make_multistream_step_fn(cfg: TrackerConfig, mesh=None):
    """jit-compiled multistream step.

    With a mesh, every input/output pytree is constrained to axis-0 ('data')
    stream sharding, so each chip advances only its own streams and XLA
    inserts no cross-chip collectives in the hot loop (all leaves carry a
    leading stream axis — `init_multistream_state`/`broadcast_cameras`
    broadcast even scalars)."""
    fn = partial(multistream_step, cfg)
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec

    s = NamedSharding(mesh, PartitionSpec("data"))
    return jax.jit(
        fn,
        in_shardings=(s, s, s, s, s),
        out_shardings=(s, s),
    )


def broadcast_cameras(cams: CameraSet, num_streams: int) -> CameraSet:
    """Tile one rig across streams (streams may also use distinct rigs)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_streams,) + x.shape), cams
    )
