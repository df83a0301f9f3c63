"""Multi-host (DCN) scale-out: jax.distributed glue + global meshes.

The reference is single-process/single-GPU (`src/ivclabpose.py:107-111` —
SURVEY.md §2.4); this is the TPU-build's multi-host story. Design:

  * one process per host; `jax.distributed.initialize` wires the cluster
    (DCN between hosts, ICI within a slice);
  * a GLOBAL ('data', 'model') mesh spans every process's devices. Stream
    parallelism keeps all hot-loop traffic local to each chip — the only
    cross-DCN collectives are metric psums and (optional) gradient
    reductions, both outside the per-frame recurrence;
  * each host feeds ONLY its own streams' frames
    (`host_local_streams` -> `global_streams`, built on
    `jax.make_array_from_process_local_data`), so the input pipeline
    never ships pixels over DCN.

Validated by a real 2-process CPU-backend cluster test
(`tests/test_multihost.py`) — the same code paths drive multi-host TPU
pods, where `initialize()` discovers the topology automatically.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or form) the multi-host cluster.

    On TPU pods all three arguments are discovered from the environment
    and may be omitted. No-op for a single process (num_processes in
    (None, 1) with no coordinator)."""
    if coordinator_address is None and (num_processes or 1) == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(model: int = 1) -> Mesh:
    """('data', 'model') mesh over ALL processes' devices.

    The 'data' (stream) axis spans hosts — device order groups each
    process's devices contiguously, so a stream lives on one host and
    its frames never cross DCN."""
    devices = jax.devices()  # global, ordered by process
    n = len(devices)
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    arr = np.array(devices).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def process_stream_slice(total_streams: int) -> tuple[int, int]:
    """[start, end) of the stream indices this process owns (streams are
    distributed evenly over processes in process order; total_streams must
    divide evenly so every device holds the same per-stream shape)."""
    np_, pid = jax.process_count(), jax.process_index()
    assert total_streams % np_ == 0, (
        f"{total_streams} streams not divisible by {np_} processes"
    )
    per = total_streams // np_
    return pid * per, (pid + 1) * per


def global_streams(mesh: Mesh, local_batch):
    """Assemble a global stream-sharded array from per-host data.

    Args:
      mesh: mesh from `global_mesh`.
      local_batch: pytree of host-local numpy arrays whose axis 0 holds
        THIS process's streams (len = total_streams / process_count).

    Returns:
      pytree of global jax.Arrays sharded ('data', ...) whose axis 0 is
      the concatenation over processes — without any cross-host copy.
    """
    def build(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(build, local_batch)


def all_hosts_metric(mesh: Mesh, fn):
    """Wrap a per-stream metric fn into a jitted global psum over 'data'.

    fn: (stream_sharded_pytree) -> scalar contribution per shard.
    Returns a callable producing the SAME global scalar on every host
    (the psum rides ICI within hosts and DCN across)."""
    def metric(tree):
        return jax.lax.psum(fn(tree), "data")

    return jax.jit(
        jax.shard_map(
            metric,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(),
        )
    )
