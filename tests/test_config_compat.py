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
