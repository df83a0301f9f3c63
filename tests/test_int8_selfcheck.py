"""--int8 safety: Pipeline.quantize_models self-check (VERDICT r3 item 2).

Plain per-tensor PTQ provably breaks learned W48 checkpoints (52.6 px
decoded error vs bf16's 0.92 px — docs/PERF.md round 3), and round 3's
CLIs defaulted to exactly that configuration with no warning. The facade
now compares int8 vs bf16 decoded keypoints (and detector boxes) on the
calibration frames after every quantize and escalates / raises / warns per
`on_drift`. These tests pin that machinery at tiny scale; the W48-scale
numbers live in scripts/int8_w48_agreement.py (chip-requiring, PERF.md).
"""
import numpy as np
import jax
import pytest

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.models.hrnet import hrnet_init, tiny_test_config
from tpupose.models.layers import fold_batchnorm
from tpupose.models.quantize import QuantizationDriftError
from tpupose.models.yolov3 import tiny_yolo_test_config, yolov3_init
from tpupose.pipeline.facade import Pipeline
from tpupose.tracking.tracker import TrackerConfig


def _make_pipe():
    scene = make_scene(num_frames=2, num_cameras=3, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width,
                          scene.height)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=3, max_dets=8)
    return Pipeline(
        cams=rig,
        tracker_cfg=tcfg,
        det_cfg=det_cfg,
        det_params=fold_batchnorm(yolov3_init(jax.random.PRNGKey(0), det_cfg)),
        pose_cfg=pose_cfg,
        pose_params=fold_batchnorm(hrnet_init(jax.random.PRNGKey(1), pose_cfg)),
    )


def _images():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (3, 120, 160, 3), np.uint8)


def test_self_check_report_produced_and_passes_at_tiny_scale(capsys):
    pipe = _make_pipe()
    # The box axis is disabled here: a RANDOM-weight tiny YOLO regresses
    # arbitrary box geometry from noise (scores saturate at 1.0 on both
    # sides but coords shift past IoU 0.5 under int8), so box agreement is
    # not defined at this scale — learned detectors snap to objects and are
    # stable (the production default 0.25 stays; W48 numbers in PERF.md).
    pipe.quantize_models(_images(), box_lost_gate=1.0)
    out = capsys.readouterr().out
    assert "int8 self-check" in out
    rep = pipe.last_quant_report
    assert set(rep) >= {"kps_median_px", "kps_p95_px", "box_lost_frac"}
    assert np.isfinite(rep["kps_median_px"])
    assert np.isfinite(rep["box_lost_frac"])
    # the keypoint axis quantizes cleanly at tiny scale -> gate passes
    assert "-> ok" in out


def test_self_check_raise_mode_fails_loudly():
    pipe = _make_pipe()
    # an impossible gate forces the drift branch deterministically
    with pytest.raises(QuantizationDriftError) as e:
        pipe.quantize_models(_images(), check_px=-1.0, on_drift="raise")
    assert "px" in str(e.value)  # the measured number is in the message


def test_self_check_escalates_to_qat_then_raises(capsys):
    pipe = _make_pipe()
    # the gate is impossible, so escalation runs distill-QAT (tiny steps)
    # and the re-check STILL fails -> raise with the post-QAT numbers
    with pytest.raises(QuantizationDriftError) as e:
        pipe.quantize_models(_images(), check_px=-1.0, on_drift="escalate",
                             escalate_steps=2, qat_batch=2)
    assert "after distill-QAT" in str(e.value)
    out = capsys.readouterr().out
    assert "escalating to label-free distill-QAT" in out


def test_self_check_warn_mode_keeps_trees(capsys):
    pipe = _make_pipe()
    pipe.quantize_models(_images(), check_px=-1.0, on_drift="warn")
    out = capsys.readouterr().out
    assert "FAILED (continuing: on_drift='warn')" in out
    # drifted trees are kept (warn mode is an explicit override)
    assert "weight_q" in pipe.pose_params["layer1"]["0"]["conv1"]


def test_self_check_disabled_with_none():
    pipe = _make_pipe()
    pipe.quantize_models(_images(), check_px=None)
    assert not hasattr(pipe, "last_quant_report")


def test_invalid_on_drift_rejected():
    pipe = _make_pipe()
    with pytest.raises(ValueError):
        pipe.quantize_models(_images(), on_drift="ignore")
