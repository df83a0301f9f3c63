"""Jittable numerical kernels shared across the framework."""
from tpupose.ops.lap import PAD_COST, masked_lap, solve_lap
from tpupose.ops.smoothing import gaussian_kernel1d, smooth_last, smooth_last_pose

__all__ = [
    "PAD_COST",
    "masked_lap",
    "solve_lap",
    "gaussian_kernel1d",
    "smooth_last",
    "smooth_last_pose",
]
