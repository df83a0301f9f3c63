"""Evaluation layer tests: transforms (vs independently coded formulas), PCP
scorer (known-error scenarios), Panoptic AP (GT==pred sanity + controlled
degradation), writers (round-trip)."""
import json
import os
import pickle

import numpy as np
import pytest

from tpupose.eval import (
    coco2panoptic14,
    coco2shelf3d,
    coco17to19,
    evaluate_panoptic,
    evaluate_pcp,
    nan_masked_sqdist,
    write_2d_result,
    write_3d_result,
)
from tpupose.eval.panoptic import load_panoptic_gt, evaluate_panoptic_from_pickle


def _ref_coco2shelf(coco_pose):
    """Independent transcription of the reference formula
    (`src/eval/transformation.py:5-39`) for cross-checking."""
    cp = coco_pose.astype(np.float64).T
    shelf = np.zeros((14, 3))
    order = [16, 14, 12, 11, 13, 15, 10, 8, 6, 5, 7, 9]
    for i, j in enumerate(order):
        shelf[i] = cp[j]
    shelf[12] = (shelf[8] + shelf[9]) / 2
    shelf[13] = shelf[12] + (cp[0] - shelf[12]) * np.array([0.78, 0.5, 1.5])
    shelf[12] = shelf[12] + (cp[0] - shelf[12]) * np.array([0.3, 0.4, 0.6])
    return shelf


def test_coco2shelf_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pose = rng.normal(size=(3, 17))
        np.testing.assert_allclose(coco2shelf3d(pose), _ref_coco2shelf(pose))


def test_coco17to19_layout():
    pose = np.arange(17 * 3, dtype=np.float64).reshape(17, 3)
    out = coco17to19(pose)
    np.testing.assert_allclose(out[0], (pose[5] + pose[6]) / 2)  # neck
    np.testing.assert_allclose(out[2], (pose[11] + pose[12]) / 2)  # hip
    np.testing.assert_allclose(out[1], pose[0])  # nose
    np.testing.assert_allclose(out[3], pose[5])  # l_shoulder


def test_coco2panoptic14_layout():
    pose = np.arange(17 * 3, dtype=np.float64).reshape(3, 17)
    out = coco2panoptic14(pose)
    assert out.shape == (14, 3)
    p = pose.T
    np.testing.assert_allclose(out[0], p[0])               # nose
    np.testing.assert_allclose(out[1], (p[11] + p[12]) / 2)  # pelvis
    np.testing.assert_allclose(out[2], p[5])               # l_shoulder
    np.testing.assert_allclose(out[13], p[16])             # r_ankle


def test_nan_masked_sqdist():
    gt = np.zeros((14, 3))
    pred_good = np.zeros((14, 3)) + 0.1
    pred_bad = np.zeros((14, 3)) + 1.0
    pred_nan = np.full((14, 3), np.nan)
    pred_nan[0] = [0.05, 0, 0]
    d = nan_masked_sqdist(gt, np.stack([pred_good, pred_bad, pred_nan]))
    assert d[0] < d[1]
    assert np.isclose(d[2], 0.05 ** 2)


def _shelf_gt_pose(seed=0):
    rng = np.random.default_rng(seed)
    # A physically-sized skeleton so alpha*bone_len thresholds are meaningful.
    base = rng.normal(scale=0.5, size=(14, 3)) + np.array([0, 0, 1.0])
    return base


def _coco_pred_matching(shelf_gt):
    """Build a COCO-17 pose whose shelf conversion ~equals shelf_gt."""
    coco = np.zeros((17, 3))
    order = [16, 14, 12, 11, 13, 15, 10, 8, 6, 5, 7, 9]
    for i, j in enumerate(order):
        coco[j] = shelf_gt[i]
    # nose chosen so the interpolated head matches isn't exact; head bones may
    # miss, which the test accounts for by perturbing only limb bones.
    coco[0] = shelf_gt[13]
    coco[[1, 2, 3, 4]] = coco[0]
    return coco.T  # (3, 17) stored format


def test_pcp_perfect_on_limb_bones():
    gt = _shelf_gt_pose()
    pred = _coco_pred_matching(gt)
    actors_gt = [[gt for _ in range(3)]]
    result = evaluate_pcp([[0, 3]], {0: [pred], 1: [pred], 2: [pred]}, actors_gt,
                          num_report_actors=1)
    check = result["check_result"]
    # The 9 direct bones (indices 0..8) are exact -> all correct.
    assert np.all(check[:, 0, :9] == 1)


def test_pcp_detects_broken_bone():
    gt = _shelf_gt_pose(1)
    pred = _coco_pred_matching(gt)
    bad = pred.copy()
    # Bone 0 is shelf joints (0, 1) = coco joints 16, 14 -> corrupt r_ankle.
    bad[:, 16] += 10.0
    actors_gt = [[gt]]
    res = evaluate_pcp([[0, 1]], {0: [bad]}, actors_gt, num_report_actors=1)
    assert res["check_result"][0, 0, 0] == -1
    # Lower legs group (bones 0, 3) is now 50%.
    assert np.isclose(res["bone_person_wise"]["Lower legs"][0], 0.5)


def test_pcp_missing_frame_counts_as_error():
    gt = _shelf_gt_pose(2)
    actors_gt = [[gt]]
    res = evaluate_pcp([[0, 1]], {0: []}, actors_gt, num_report_actors=1)
    assert np.all(res["check_result"][0, 0] == -1)
    assert res["person_wise"][0] == 0.0


def _fake_panoptic_gt(tmp_path, poses_mm_by_ts):
    """Write body3DScene_*.json files matching the Panoptic layout."""
    anno = tmp_path / "hdPose3d_stage1_coco19"
    anno.mkdir()
    Minv = np.linalg.inv(np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]))
    for ts, poses in poses_mm_by_ts.items():
        bodies = []
        for pose14_mm in poses:
            j19 = np.zeros((19, 4))
            # invert the scorer's transform: gt_mm = (raw @ M) * 10
            raw = (pose14_mm / 10.0) @ Minv
            j19[1:15, :3] = raw
            j19[:, 3] = 1.0
            bodies.append({"joints19": j19.reshape(-1).tolist()})
        with open(anno / f"body3DScene_{ts:08d}.json", "w") as f:
            json.dump({"bodies": bodies}, f)


def _pred_from_gt14(pose14_mm):
    """COCO-17 (3,17) whose coco2panoptic14*1000 equals pose14_mm where
    determined."""
    coco = np.zeros((17, 3))
    m = pose14_mm / 1000.0
    coco[0] = m[0]
    coco[[5, 7, 9, 11, 13, 15]] = m[2:8]
    coco[[6, 8, 10, 12, 14, 16]] = m[8:14]
    # pelvis row of the conversion = (coco11+coco12)/2 = (m[5]+m[11])/2, which
    # generally != m[1]; tests set m[1] accordingly.
    return coco.T


def test_panoptic_ap_perfect(tmp_path):
    rng = np.random.default_rng(0)
    gt_by_ts = {}
    preds = {}
    for ts in (0, 12, 24):
        pose = rng.normal(scale=300, size=(14, 3)) + 1000
        pose[1] = (pose[5] + pose[11]) / 2  # consistent pelvis
        gt_by_ts[ts] = [pose]
        preds[ts] = [_pred_from_gt14(pose)]
    _fake_panoptic_gt(tmp_path, gt_by_ts)
    gts = load_panoptic_gt(str(tmp_path), interval=1)
    assert set(gts) == {0, 12, 24}
    aps, recs, mpjpe, rec500 = evaluate_panoptic(gts, preds)
    assert np.allclose(aps, 1.0, atol=1e-6)
    assert mpjpe < 1e-3
    assert rec500 == 1.0


def test_panoptic_ap_degrades(tmp_path):
    rng = np.random.default_rng(1)
    pose = rng.normal(scale=300, size=(14, 3)) + 1000
    pose[1] = (pose[5] + pose[11]) / 2
    _fake_panoptic_gt(tmp_path, {0: [pose]})
    gts = load_panoptic_gt(str(tmp_path), interval=1)
    bad = _pred_from_gt14(pose + 60.0)  # 60mm/axis => ~103.9mm joint error
    aps, recs, mpjpe, _ = evaluate_panoptic(gts, {0: [bad]})
    assert aps[0] < 0.5 and aps[-1] > 0.5
    assert 100 < mpjpe < 108


def test_writers_roundtrip(tmp_path):
    poses = {0: [np.ones((3, 17))], 1: []}
    path = str(tmp_path / "logs" / "preds.pkl")
    write_3d_result(poses, path)
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    np.testing.assert_allclose(loaded[0][0], poses[0][0])

    anns = [
        {"timestamp": "00100", "cid": 0, "pid": 3,
         "pose": np.zeros((17, 2)), "scores": np.ones(17)},
        {"timestamp": "00100", "cid": 1, "pid": 3,
         "pose": np.ones((17, 2)), "scores": np.ones(17)},
    ]
    write_2d_result((720, 1280), anns, save_dir=str(tmp_path / "2d"))
    with open(tmp_path / "2d" / "Camera0.json") as f:
        data = json.load(f)
    assert data["image_wh"] == [1280, 720]
    frame = list(data["frames"].values())[0]
    assert frame["poses"][0]["id"] == 3
    assert len(frame["poses"][0]["points_2d"]) == 17
