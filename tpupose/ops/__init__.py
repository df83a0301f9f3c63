"""Jittable numerical kernels shared across the framework."""
from tpupose.ops.affinity import (
    embedding_affinity,
    normalized_geometry_affinity,
    pairwise_affinity,
    pairwise_sq_distances,
)
from tpupose.ops.heatmap import decode_heatmaps, expand_box_to_aspect
from tpupose.ops.image import crop_and_resize, resize_bilinear
from tpupose.ops.lap import PAD_COST, masked_lap, solve_lap
from tpupose.ops.matchmat import proj2dpam, proj2pav, transform_closure
from tpupose.ops.nms import iou_matrix, nms
from tpupose.ops.smoothing import gaussian_kernel1d, smooth_last, smooth_last_pose

__all__ = [
    "embedding_affinity",
    "normalized_geometry_affinity",
    "pairwise_affinity",
    "pairwise_sq_distances",
    "decode_heatmaps",
    "expand_box_to_aspect",
    "crop_and_resize",
    "resize_bilinear",
    "PAD_COST",
    "masked_lap",
    "solve_lap",
    "proj2dpam",
    "proj2pav",
    "transform_closure",
    "iou_matrix",
    "nms",
    "gaussian_kernel1d",
    "smooth_last",
    "smooth_last_pose",
]
