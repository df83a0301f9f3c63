"""Configs, dataset manifests, synthetic fixtures."""
from tpupose.data.config import Config, load_config, tracker_config_from
from tpupose.data.dataset import load_filenames, load_images, parse_timestamp
from tpupose.data.synthetic import SyntheticScene, camera_ring, make_scene

__all__ = [
    "Config",
    "load_config",
    "tracker_config_from",
    "load_filenames",
    "load_images",
    "parse_timestamp",
    "SyntheticScene",
    "camera_ring",
    "make_scene",
]
