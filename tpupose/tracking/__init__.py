"""Multi-view 3D pose tracking: jittable tracker, oracle spec, matchers,
temporal filters."""
from tpupose.tracking.tracker import (
    FrameOutput,
    TrackerConfig,
    TrackerState,
    init_state,
    make_step_fn,
    track_clip,
    tracker_step,
)

__all__ = [
    "FrameOutput",
    "TrackerConfig",
    "TrackerState",
    "init_state",
    "make_step_fn",
    "track_clip",
    "tracker_step",
]
