"""Parallelism: device meshes, sharding plans, multi-stream throughput mode.

Axes: 'data' (batch/stream parallelism — the primary scaling axis for this
workload) and 'model' (optional channel TP for the conv backbones). Pipeline
and expert parallelism are deliberately absent: a 63M-param HRNet-W48 fits on
one chip; the production win is many frames/streams per chip (SURVEY.md §2.4).
"""
from tpupose.parallel.mesh import (
    conv_param_sharding,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from tpupose.parallel import multihost
from tpupose.parallel.streams import (
    broadcast_cameras,
    init_multistream_state,
    make_multistream_step_fn,
    multistream_step,
    shard_streams,
)

__all__ = [
    "multihost",
    "conv_param_sharding",
    "data_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "broadcast_cameras",
    "init_multistream_state",
    "make_multistream_step_fn",
    "multistream_step",
    "shard_streams",
]
