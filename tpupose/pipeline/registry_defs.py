"""Default registry entries (detectors, pose models, matchers, test fns).

Replaces the reference's string `eval()` dispatch with explicit factories
(`src/testmodel.py:107`, `src/tracking/IterativeTracker.py:175`). Importing
this module populates the registries.
"""
from __future__ import annotations

from tpupose.utils.registry import (
    BUILD_3D_KERNELS,
    DETECTORS,
    INIT_METHODS,
    MATCHERS,
    POSE_MODELS,
    TEST_FUNCTIONS,
)


@DETECTORS.register("yolov3")
def build_yolov3(cfg):
    """cfg: data.config.DetectModelConfig -> (YoloConfig, params)."""
    from tpupose.models.convert import load_darknet_weights
    from tpupose.models.yolov3 import YoloConfig

    det_cfg = YoloConfig(score_thresh=cfg.score_thresh, nms_thresh=cfg.nms_thresh)
    params, _ = load_darknet_weights(cfg.weight, det_cfg)
    return det_cfg, params


@DETECTORS.register("none")
def build_no_detector(cfg):
    return None, None


@POSE_MODELS.register("hrpose")
def build_hrpose(cfg):
    """cfg: data.config.PoseModelConfig -> (HRNetConfig, params)."""
    from tpupose.models.convert import load_hrnet_torch_checkpoint
    from tpupose.models.hrnet import HRNetConfig

    pose_cfg = HRNetConfig(
        width=cfg.c, num_joints=cfg.num_joints, input_size=tuple(cfg.resolution)
    )
    params = load_hrnet_torch_checkpoint(cfg.checkpoint_file)
    return pose_cfg, params


@MATCHERS.register("iterative")
def build_iterative(cfg, num_cameras):
    """cfg: data.config.Config -> TrackerConfig."""
    from tpupose.data.config import tracker_config_from

    return tracker_config_from(cfg, num_cameras=num_cameras)


@INIT_METHODS.register("gd")
def init_method_greedy():
    """Greedy hypothesis building (the shipped INIT_METHOD in all reference
    YAMLs) — implemented inside the jitted tracker."""
    return "gd"


@INIT_METHODS.register("bip")
def init_method_bip():
    """BIP clique-partition alternative (host-side solver,
    tpupose.tracking.bip)."""
    return "bip"


@BUILD_3D_KERNELS.register("svd")
def build_3d_svd():
    """Time-weighted masked DLT-SVD — the production kernel (the reference's
    `SVD_pose_kernel_jf`, `src/utils/construction.py:89-114`; asserted as the
    only tracking path at `src/tracking/IterativeTracker.py:306`)."""
    from tpupose.geometry import triangulate_joints

    return triangulate_joints


@BUILD_3D_KERNELS.register("topdown")
def build_3d_top_down():
    """All-pairs two-view DLT with min-reprojection pair selection (the
    reference's `top_down_pose_kernel`, `src/utils/construction.py:9-31`)."""
    from tpupose.geometry import triangulate_top_down

    return triangulate_top_down


@TEST_FUNCTIONS.register("persontrack_project3dpose")
def test_function_track(cfg, datas):
    from tpupose.cli import evalmodel  # noqa: F401 — canonical loop lives there

    raise NotImplementedError(
        "use tpupose.cli.testmodel / evalmodel mains; registered for name "
        "validation of TEST_FUNCTION"
    )
