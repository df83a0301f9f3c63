"""Config-schema compatibility: the typed loader must accept both this
repo's YAMLs and the reference's shipped YAMLs verbatim (including the
Panoptic PERSON_M typo)."""
import os

import pytest

from tpupose.data.config import load_config, tracker_config_from

REPO_CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
REFERENCE_CONFIGS = "/root/reference/src/configs"


@pytest.mark.parametrize("ds", ["CampusSeq1", "Shelf", "Panoptic"])
def test_repo_configs_load(ds):
    cfg = load_config(os.path.join(REPO_CONFIGS, ds, "model_configs.yaml"))
    assert cfg.pipeline.build_3d == "SVD"
    assert cfg.matcher.init_method == "GD"
    tcfg = tracker_config_from(cfg, num_cameras=len(cfg.dataset.folders_order))
    assert tcfg.num_cameras == len(cfg.dataset.folders_order)
    assert tcfg.n_init == 3 and tcfg.max_age == 10


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIGS), reason="reference not mounted"
)
@pytest.mark.parametrize("ds", ["CampusSeq1", "Shelf", "Panoptic"])
def test_reference_configs_load_verbatim(ds):
    cfg = load_config(os.path.join(REFERENCE_CONFIGS, ds, "model_configs.yaml"))
    # Hyper-parameters survive the typed conversion.
    expected_alpha2d = {"CampusSeq1": 30.0, "Shelf": 70.0, "Panoptic": 60.0}[ds]
    assert cfg.matcher.alpha2d == expected_alpha2d
    expected_conf = {"CampusSeq1": 0.4, "Shelf": 0.5, "Panoptic": 0.4}[ds]
    assert cfg.pipeline.conf_threshold == expected_conf
    # The Panoptic YAML's PERSON_M typo must not break matcher parsing
    # (SURVEY.md §2.3).
    assert cfg.matcher.name == "Iterative"
    assert cfg.matcher.lambda_t == 5.0


def test_joint_gate_plumbed_from_yaml(tmp_path):
    """JOINT_GATE reaches TrackerConfig; default is the reference's hardcoded
    10 (`src/tracking/IterativeTracker.py:145`); 14 expresses the Campus
    variant its comment describes."""
    import yaml

    from tpupose.tracking.tracker import CAMPUS_JOINT_GATE, REFERENCE_JOINT_GATE

    base = os.path.join(REPO_CONFIGS, "CampusSeq1", "model_configs.yaml")
    cfg = load_config(base)
    assert cfg.matcher.joint_gate == REFERENCE_JOINT_GATE
    tcfg = tracker_config_from(cfg, num_cameras=3)
    assert tcfg.joint_gate == REFERENCE_JOINT_GATE

    with open(base) as f:
        raw = yaml.safe_load(f)
    raw["PERSON_MATCHERS"]["ITERATIVE"]["JOINT_GATE"] = CAMPUS_JOINT_GATE
    variant = tmp_path / "model_configs.yaml"
    variant.write_text(yaml.safe_dump(raw))
    cfg14 = load_config(str(variant))
    assert cfg14.matcher.joint_gate == CAMPUS_JOINT_GATE
    assert tracker_config_from(cfg14, num_cameras=3).joint_gate == CAMPUS_JOINT_GATE


def test_joint_gate_changes_association():
    """A stricter gate must reject matches a looser gate accepts (the gate
    compares the count of positive per-joint scores, not their mean)."""
    import numpy as np

    from tpupose.data.synthetic import make_scene
    from tpupose.geometry import make_camera_set
    from tpupose.tracking import oracle

    scene = make_scene(num_frames=6, num_cameras=3, num_actors=2,
                       noise_px=0.5, seed=3)
    cams = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)

    def run(gate):
        p = oracle.TrackerParams(joint_gate=gate)
        rig = oracle.OracleTracker.make_cameras(
            np.asarray(cams.P), np.asarray(cams.F),
            np.asarray(cams.rk_inv), np.asarray(cams.center),
        )
        trk = oracle.OracleTracker(rig, p)
        for t in range(scene.num_frames):
            trk.step(t, scene.detections_list(t))
        return sum(1 for tr in trk.tracks if tr.state == oracle.CONFIRMED)

    # gate 10 (> 10 positive joints) lets clean matches through, so tracks
    # accumulate updates and confirm; gate 17 demands > 17 positive joints,
    # impossible with 17 joints, so association never fires and no track can
    # ever confirm.
    assert run(10) > 0
    assert run(17) == 0

def test_w32_pose_model_reachable_from_yaml(tmp_path):
    """Setting C: 32 + RESOLUTION in the reference YAML schema must yield
    the official pose_hrnet_w32 topology through `hrnet_config_from` (the
    fast-serving alternative model, docs/PERF.md r3)."""
    import yaml

    from tpupose.cli.common import hrnet_config_from
    from tpupose.models.hrnet import hrnet_w32_config

    base = os.path.join(REPO_CONFIGS, "CampusSeq1", "model_configs.yaml")
    with open(base) as f:
        raw = yaml.safe_load(f)
    hr = raw["POSE_MODELS"]["HRPOSE"]
    hr["C"] = 32
    hr["RESOLUTION"] = [256, 192]
    variant = tmp_path / "model_configs.yaml"
    variant.write_text(yaml.safe_dump(raw))
    cfg = load_config(str(variant))
    assert hrnet_config_from(cfg) == hrnet_w32_config()


def test_decode_refine_reachable_from_yaml(tmp_path):
    """`DECODE_REFINE: parabolic` in the POSE_MODELS section must select
    the tie-robust sub-pixel decode in the pipeline's HRNetConfig; absent,
    the reference-parity quarter shift stays the default."""
    import yaml

    from tpupose.cli.common import hrnet_config_from

    base = os.path.join(REPO_CONFIGS, "CampusSeq1", "model_configs.yaml")
    with open(base) as f:
        raw = yaml.safe_load(f)
    assert hrnet_config_from(load_config(base)).decode_refine == "quarter"
    raw["POSE_MODELS"]["HRPOSE"]["DECODE_REFINE"] = "parabolic"
    variant = tmp_path / "model_configs.yaml"
    variant.write_text(yaml.safe_dump(raw))
    cfg = load_config(str(variant))
    assert hrnet_config_from(cfg).decode_refine == "parabolic"
