"""Converter schema pinned against the REAL pretrained artifacts — offline.

The accuracy story funnels through `load_hrnet_torch_checkpoint` /
`load_darknet_weights` (tpupose/models/convert.py), which in production
consume the official `pose_hrnet_w48_384x288.pth` and `yolov3.weights`
(`/root/reference/src/configs/CampusSeq1/model_configs.yaml:38-57`,
`/root/reference/README.md:72-80`). Those artifacts are not available in
this environment, but their SCHEMAS are checkable offline:

  * the official pose_hrnet state_dict key set + shapes are derived
    independently in `tests/hrnet_manifest.py` (from the public pose_hrnet
    module structure, incl. Sequential/ModuleList index nesting like
    `transition1.1.0.0.weight`) and frozen in
    `tests/fixtures/pose_hrnet_w48_384x288.keys.txt`;
  * the real `yolov3.weights` payload is exactly 62,001,757 float32s
    (248,007,048 file bytes minus the 20-byte v0.2 header — the public
    download's size).

These tests assert this framework's param trees/specs match both exactly,
so a first real-weights run can only fail on numerics, never on layout.
"""
import math
import os

import jax
import numpy as np
import pytest

from tests.hrnet_manifest import (
    manifest_lines,
    official_pose_hrnet_manifest,
    official_pose_hrnet_w48_manifest,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "pose_hrnet_w48_384x288.keys.txt"
)
FIXTURE_W32 = os.path.join(
    os.path.dirname(__file__), "fixtures", "pose_hrnet_w32.keys.txt"
)

#: Public facts about the real artifacts.
YOLOV3_WEIGHTS_FLOATS = 62_001_757      # payload float32 count
YOLOV3_WEIGHTS_BYTES = 248_007_048      # = 20-byte header + 4 * floats
POSE_HRNET_W48_TRAINABLE = 63_595_745   # the "63.6M" of the HRNet paper
POSE_HRNET_W32_TRAINABLE = 28_536_113   # the "28.5M" of the HRNet paper


def _load_fixture(path=FIXTURE):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    out = {}
    for ln in lines:
        key, shape = ln.split(" ")
        out[key] = () if shape == "scalar" else tuple(
            int(d) for d in shape.split("x")
        )
    return out


def test_fixture_is_fresh():
    # the committed fixture must equal the rule-based generator's output —
    # neither can drift without the other noticing
    with open(FIXTURE) as f:
        on_disk = [ln.rstrip("\n") for ln in f if ln.strip()]
    assert on_disk == manifest_lines(official_pose_hrnet_w48_manifest())


def test_manifest_param_counts_match_public_numbers():
    for width, want in ((48, POSE_HRNET_W48_TRAINABLE),
                        (32, POSE_HRNET_W32_TRAINABLE)):
        m = official_pose_hrnet_manifest(width)
        trainable = sum(
            math.prod(s)
            for k, s in m
            if not k.endswith(
                ("running_mean", "running_var", "num_batches_tracked")
            )
        )
        assert trainable == want, width


@pytest.fixture(scope="module")
def w48_tree_shapes():
    """Key -> torch-layout shape for this framework's W48 init tree, via
    the converter's inverse (`tree_to_torch_state_dict`). Shape-only
    (eval_shape): no 63M-param materialization needed."""
    from tpupose.models.convert import tree_to_torch_state_dict
    from tpupose.models.hrnet import hrnet_init, hrnet_w48_config

    tree = jax.eval_shape(
        lambda: hrnet_init(jax.random.PRNGKey(0), hrnet_w48_config())
    )

    out = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                shape = tuple(v.shape)
                if len(shape) == 4 and name.endswith("weight"):
                    # converter transposes HWIO -> OIHW on export
                    h, w, i, o = shape
                    shape = (o, i, h, w)
                out[name] = shape
        return out

    # mirror tree_to_torch_state_dict's naming on shape structs
    assert tree_to_torch_state_dict is not None
    return walk(tree, "")


def test_hrnet_w48_keys_match_official_checkpoint(w48_tree_shapes):
    manifest = _load_fixture()
    expected = {
        k: s for k, s in manifest.items()
        if not k.endswith("num_batches_tracked")
    }
    got = w48_tree_shapes
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    assert not missing, f"keys the real .pth has but the tree lacks: {missing[:10]}"
    assert not extra, f"keys the tree has but the real .pth lacks: {extra[:10]}"


def test_hrnet_w48_shapes_match_official_checkpoint(w48_tree_shapes):
    manifest = _load_fixture()
    bad = [
        (k, w48_tree_shapes[k], s)
        for k, s in manifest.items()
        if not k.endswith("num_batches_tracked")
        and w48_tree_shapes[k] != s
    ]
    assert not bad, f"shape mismatches (key, tree, official): {bad[:10]}"


def test_hrnet_official_state_dict_loads_into_tree_structure():
    """`torch_state_dict_to_tree` fed a state dict with EXACTLY the official
    keys must produce the init tree's nesting + HWIO shapes (so
    `hrnet_apply` can consume a real checkpoint directly)."""
    from tpupose.models.convert import torch_state_dict_to_tree
    from tpupose.models.hrnet import hrnet_init, hrnet_w48_config

    manifest = _load_fixture()
    sd = {
        k: np.zeros(s, np.float32)
        for k, s in manifest.items()
    }
    tree = torch_state_dict_to_tree(sd)
    want = jax.eval_shape(
        lambda: hrnet_init(jax.random.PRNGKey(0), hrnet_w48_config())
    )
    got_paths = {
        jax.tree_util.keystr(p): tuple(v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }
    want_paths = {
        jax.tree_util.keystr(p): tuple(v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(want)
    }
    assert got_paths == want_paths


def test_w32_fixture_is_fresh():
    with open(FIXTURE_W32) as f:
        on_disk = [ln.rstrip("\n") for ln in f if ln.strip()]
    assert on_disk == manifest_lines(official_pose_hrnet_manifest(32))


def test_hrnet_w32_matches_official_checkpoint():
    """The W32 family member (official pose_hrnet_w32_256x192/384x288
    checkpoints — the key set is input-size-independent) must load with
    the SAME converter: tree keys+shapes == the W32 manifest."""
    from tpupose.models.hrnet import hrnet_init, hrnet_w32_config

    tree = jax.eval_shape(
        lambda: hrnet_init(jax.random.PRNGKey(0), hrnet_w32_config())
    )

    got = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                shape = tuple(v.shape)
                if len(shape) == 4 and name.endswith("weight"):
                    h, w, i, o = shape
                    shape = (o, i, h, w)
                got[name] = shape

    walk(tree, "")
    expected = {
        k: s for k, s in _load_fixture(FIXTURE_W32).items()
        if not k.endswith("num_batches_tracked")
    }
    assert set(got) == set(expected), (
        sorted(set(expected) - set(got))[:10],
        sorted(set(got) - set(expected))[:10],
    )
    bad = [(k, got[k], s) for k, s in expected.items() if got[k] != s]
    assert not bad, bad[:10]


def test_yolov3_weights_payload_size():
    """The real yolov3.weights payload must map 1:1 onto conv_specs."""
    from tpupose.models.yolov3 import YoloConfig, conv_in_channels

    cfg = YoloConfig()
    total = 0
    for (cout, k, s, bn), cin in zip(cfg.conv_specs, conv_in_channels(cfg)):
        total += (4 * cout if bn else cout) + cout * cin * k * k
    assert total == YOLOV3_WEIGHTS_FLOATS
    assert 12 + 8 + 4 * total == YOLOV3_WEIGHTS_BYTES  # v0.2 header is 20 B


@pytest.mark.skipif(
    os.environ.get("TPUPOSE_FULLSIZE") != "1",
    reason="full-size dress rehearsal (~500 MB of fabricated artifacts, "
           "minutes of CPU); opt in with TPUPOSE_FULLSIZE=1",
)
def test_fullsize_dress_rehearsal(tmp_path):
    """REAL-format, REAL-size ingestion end-to-end: torch-zipfile .pth with
    the official 1754 keys + byte-exact 248,007,048-byte yolov3.weights
    through the convert CLI into a bundle, reloaded torch-free with numeric
    spot checks (scripts/fullsize_dress_rehearsal.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fullsize_dress_rehearsal",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "fullsize_dress_rehearsal.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.run(str(tmp_path), forward=False, keep=False)


def test_yolov3_head_conv_shapes():
    """The three detection convs must be 255-channel 1x1 (3*(5+80)) fed by
    1024/512/256 — the real file's layout at those offsets."""
    from tpupose.models.yolov3 import YoloConfig, conv_in_channels

    cfg = YoloConfig()
    specs, cins = cfg.conv_specs, conv_in_channels(cfg)
    for idx, cin_want in ((58, 1024), (66, 512), (74, 256)):
        cout, k, s, bn = specs[idx]
        assert (cout, k, bn) == (255, 1, False)
        assert cins[idx] == cin_want
