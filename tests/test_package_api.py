"""Package surface: both import spellings work; top-level APIs resolve."""


def test_short_name_imports():
    import tpupose
    from tpupose.data import make_scene
    from tpupose.models import hrnet_w48_config
    from tpupose.pipeline import Pipeline
    from tpupose.tracking import TrackerConfig

    assert tpupose.__version__


def test_full_project_name_alias():
    import part_aware_measurement_for_3d_pose_estimation_and_tracking_tpu as pam

    assert hasattr(pam, "geometry")
    assert hasattr(pam.tracking, "tracker_step")
    assert pam.models.hrnet_w48_config().width == 48
    # Submodule import path also works through sys.modules aliasing.
    from part_aware_measurement_for_3d_pose_estimation_and_tracking_tpu.ops import (  # noqa: E501
        solve_lap,
    )

    assert callable(solve_lap)
