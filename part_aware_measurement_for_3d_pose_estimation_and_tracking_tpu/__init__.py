"""Alias package matching the full project name.

The canonical implementation lives in :mod:`tpupose` (short, importable name).
This package re-exports every subpackage so both spellings work:

    import part_aware_measurement_for_3d_pose_estimation_and_tracking_tpu as pam
    pam.geometry.triangulate_dlt(...)
"""
import importlib
import sys

import tpupose as _impl

_SUBPACKAGES = [
    "geometry", "ops", "models", "tracking", "parallel",
    "pipeline", "eval", "data", "utils", "cli", "runtime",
]

__version__ = _impl.__version__

for _name in _SUBPACKAGES:
    _mod = importlib.import_module(f"tpupose.{_name}")
    sys.modules[f"{__name__}.{_name}"] = _mod
    globals()[_name] = _mod
