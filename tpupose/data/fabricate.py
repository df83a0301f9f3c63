"""Fabricated on-disk mini-dataset: drive the FULL real-data code path
(glob -> natsort -> decode -> detect/pose or replay -> track -> pkl ->
PCP) without any real dataset or pretrained weights.

Produces, under a root directory, everything the reference's Campus layout
provides (`src/dataset.py:19-45`, `src/evalmodel.py:120-206`):
  * per-camera image folders (rendered from a synthetic scene),
  * `camera_parameter.pickle` ({P, K, RT} stacks),
  * `actorsGT.mat` in the reference's actor3D cell layout,
  * a cached-2D-detections replay dump (reference dump format),
  * a reference-schema YAML config (plus tiny-model extension keys),
  * optional tiny converted checkpoints (.weights / .pth) so the real
    NN path runs end-to-end with fabricated weights.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

#: COCO-17 skeleton edges for rendering.
_EDGES = [
    (5, 7), (7, 9), (6, 8), (8, 10), (11, 13), (13, 15), (12, 14), (14, 16),
    (5, 6), (11, 12), (5, 11), (6, 12), (0, 5), (0, 6),
]


def render_frame(gt2d_frame, visible, width, height, radius=4):
    """Render one camera view: colored stick figures on a gray background.

    gt2d_frame: (A, J, 2) projections; visible: (A,) bool.
    Returns an (H, W, 3) uint8 RGB array.
    """
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (width, height), (96, 96, 96))
    draw = ImageDraw.Draw(img)
    colors = [(230, 60, 60), (60, 200, 80), (70, 110, 240), (230, 200, 50),
              (200, 70, 220), (70, 220, 220)]
    for a in range(gt2d_frame.shape[0]):
        if not visible[a]:
            continue
        color = colors[a % len(colors)]
        pts = gt2d_frame[a]
        for i, j in _EDGES:
            draw.line(
                [tuple(pts[i].tolist()), tuple(pts[j].tolist())],
                fill=color, width=3,
            )
        for p in pts:
            x, y = float(p[0]), float(p[1])
            draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                         fill=color)
    return np.asarray(img)


def make_actors_gt_mat(path, gt3d):
    """Write `actorsGT.mat` in the reference layout: actor3D is a cell row
    of actors; each actor a cell column over frames; each frame a (14, 3)
    Shelf-order pose (or empty) — consumed at `src/evalmodel.py:136-137,150`.
    """
    import scipy.io as scio

    from tpupose.eval.transforms import coco2shelf3d

    T, A = gt3d.shape[:2]
    actor3d = np.empty((1, A), dtype=object)
    for a in range(A):
        frames = np.empty((T, 1), dtype=object)
        for t in range(T):
            frames[t, 0] = coco2shelf3d(gt3d[t, a].T)
        actor3d[0, a] = frames
    scio.savemat(path, {"actor3D": actor3d})


def fabricate_mini_dataset(root, scene=None, dataset_name="MiniCampus",
                           num_frames=24, seed=0, with_weights=False,
                           image_format="jpg", photo_noise=0.0,
                           jpeg_quality=None):
    """Build the complete on-disk mini-dataset. Returns (config_path, paths).

    paths: dict with root / dump / yaml / weights entries.
    """
    import yaml

    from tpupose.data.replay import dets_to_dump_frame, save_detection_dump
    from tpupose.data.synthetic import make_scene

    if scene is None:
        scene = make_scene(num_frames=num_frames, num_cameras=3, num_actors=2,
                           noise_px=0.0, drop_prob=0.0, seed=seed)
    root = str(root)
    os.makedirs(root, exist_ok=True)
    folders = [f"Camera{c}" for c in range(scene.num_cameras)]

    # Per-camera frames, natsort-hostile names on purpose (frame10 < frame9
    # lexically) so the natural sort actually matters.
    # photo_noise > 0 overlays per-pixel uint8 noise before the JPEG
    # encode so the files carry photo-like entropy (a clean stick-figure
    # render compresses to a few KB and decodes unrealistically fast —
    # the ingest dress rehearsal needs realistic decode cost, matching
    # runtime/ingest_bench.py::fabricate_jpeg_dataset).
    noise_rng = np.random.default_rng(seed + 1)
    for c, folder in enumerate(folders):
        d = os.path.join(root, folder)
        os.makedirs(d, exist_ok=True)
        for t in range(scene.num_frames):
            img = render_frame(
                scene.gt2d[t, c], scene.visible[t, c],
                scene.width, scene.height,
            )
            if photo_noise > 0.0:
                img = np.clip(
                    img.astype(np.int16) + noise_rng.integers(
                        -int(photo_noise), int(photo_noise) + 1, img.shape
                    ),
                    0, 255,
                ).astype(np.uint8)
            from PIL import Image

            kw = {} if jpeg_quality is None else {"quality": jpeg_quality}
            Image.fromarray(img).save(
                os.path.join(d, f"campus4-c{c}-{t}.{image_format}"), **kw
            )

    with open(os.path.join(root, "camera_parameter.pickle"), "wb") as f:
        pickle.dump({"P": scene.P, "K": scene.K, "RT": scene.RT}, f)

    make_actors_gt_mat(os.path.join(root, "actorsGT.mat"), scene.gt3d)

    # Replay dump in the reference's per-camera dict format.
    dump = {}
    for t in range(scene.num_frames):
        dets = np.zeros((scene.num_cameras, 8, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, 8), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), 8)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        dump[t] = dets_to_dump_frame(dets, mask)
    dump_path = os.path.join(root, "detections_dump.pkl")
    save_detection_dump(dump_path, dump)

    paths = {"root": root, "dump": dump_path}

    if with_weights:
        paths.update(_fabricate_tiny_weights(root))

    cfg = {
        "TEST_FUNCTION": "PersonTrack_Project3DPose",
        "PIPELINE_COMBINATION": {
            "DETECT_MODEL": "YOLOv3",
            "POSE_MODEL": "HRPose",
            "PERSON_MATCHER": "Iterative",
            "BUILD_3D": "SVD",
            "CONF_THRESHOLD": 0.4,
        },
        "DATASET": {
            "TEST_DATASET": dataset_name,
            "ROOT": root,
            "FOLDERS_ORDER": folders,
            "CALIBRATION_FILE": "camera_parameter.pickle",
            "DATA_FORMAT": f"*.{image_format}",
            "TEST_RANGE": [0, scene.num_frames],
            "EVAL_RANGE": [5, scene.num_frames],
        },
        **_tiny_model_cfg_sections(paths),
        "PERSON_MATCHERS": {
            "ITERATIVE": {
                "NAME": "Iterative",
                "EPI_THRESHOLD": 25,
                "INIT_THRESHOLD": 15,
                "JOINT_THRESHOLD": 15,
                "NUM_JOINTS": 17,
                "INIT_METHOD": "GD",
                "N_INIT": 3,
                "MAX_AGE": 10,
                "W2D": 0.4,
                "ALPHA2D": 30,
                "W3D": 0.6,
                "ALPHA3D": 0.25,
                "LAMBDA_A": 3,
                "LAMBDA_T": 5,
                "SIGMA": 0.6,
                "ARM_SIGMA": 0.8,
            },
        },
        "OUTPUT": os.path.join(root, "results"),
    }
    cfg_dir = os.path.join(root, "configs", dataset_name)
    os.makedirs(cfg_dir, exist_ok=True)
    cfg_path = os.path.join(cfg_dir, "model_configs.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    paths["yaml"] = cfg_path
    paths["config_dir"] = os.path.join(root, "configs")
    return cfg_path, paths


def _tiny_model_cfg_sections(paths):
    """DETECT_MODELS / POSE_MODELS config sections for the fabricated tiny
    checkpoints (shared by MiniCampus and MiniPanoptic so the NN path is
    configured identically on both)."""
    return {
        "DETECT_MODELS": {
            "YOLOV3": {
                "NAME": "YOLOv3",
                "WEIGHT": paths.get("yolo_weights", ""),
                "SCORE_THRESH": 0.3,
                "NMS_THRESH": 0.4,
                "WIDTH_MULT": 1 / 16,
                "NUM_CLASSES": 2,
                "INPUT_SIZE": 64,
                "MAX_CANDIDATES": 8,
            },
        },
        "POSE_MODELS": {
            "HRPOSE": {
                "NAME": "HRPose",
                "C": 8,
                "NUM_JOINTS": 17,
                "CHECKPOINT_FILE": paths.get("hrnet_checkpoint", ""),
                "MODEL_NAME": "HRNet",
                "RESOLUTION": [96, 64],
                "STEM_CHANNELS": 16,
                "LAYER1_BLOCKS": 1,
                "LAYER1_PLANES": 8,
                "STAGE_MODULES": [1, 1, 1],
                "STAGE_BLOCKS": 1,
            },
        },
    }


def fabricate_mini_panoptic(root, scene=None, num_frames=24, seed=0,
                            gt_start=5, image_format="jpg",
                            with_weights=False):
    """Mini-dataset in the CMU Panoptic layout: timestamped frame names
    (`hd_00_XX_<t:08d>.jpg` — timestamp parsed from the last `_` suffix,
    `src/dataset.py:37-40`), `hdPose3d_stage1_coco19/body3DScene_*.json` GT
    (every 12th file scored, axis-swap + cm scaling inverted so the loader
    reproduces our 3D GT exactly — `src/evalmodel.py:212-248`), calibration
    pickle and a replay dump. Returns (config_path, paths)."""
    import json

    import yaml

    from tpupose.data.replay import dets_to_dump_frame, save_detection_dump
    from tpupose.data.synthetic import make_scene
    from tpupose.eval.panoptic import GT_AXES_M
    from tpupose.eval.transforms import coco2panoptic14

    if scene is None:
        scene = make_scene(num_frames=num_frames, num_cameras=3, num_actors=2,
                           noise_px=0.0, drop_prob=0.0, seed=seed)
    root = str(root)
    os.makedirs(root, exist_ok=True)
    folders = [f"00_{c:02d}" for c in range(scene.num_cameras)]
    for c, folder in enumerate(folders):
        d = os.path.join(root, folder)
        os.makedirs(d, exist_ok=True)
        for t in range(scene.num_frames):
            from PIL import Image

            img = render_frame(scene.gt2d[t, c], scene.visible[t, c],
                               scene.width, scene.height)
            Image.fromarray(img).save(
                os.path.join(d, f"hd_00_{c:02d}_{t:08d}.{image_format}")
            )

    with open(os.path.join(root, "camera_parameter.pickle"), "wb") as f:
        pickle.dump({"P": scene.P, "K": scene.K, "RT": scene.RT}, f)

    # GT jsons: file list starts at gt_start so the every-12th-file rule
    # lands on post-warmup timestamps (gt_start, gt_start+12, ...).
    anno = os.path.join(root, "hdPose3d_stage1_coco19")
    os.makedirs(anno, exist_ok=True)
    Minv = GT_AXES_M.T  # orthogonal
    for t in range(gt_start, scene.num_frames):
        bodies = []
        for a in range(scene.num_actors):
            p14_mm = coco2panoptic14(scene.gt3d[t, a].T) * 1000.0
            raw = (p14_mm / 10.0) @ Minv  # loader: raw @ M * 10 -> mm
            j19 = np.zeros((19, 4))
            j19[1:15, :3] = raw
            j19[:, 3] = 1.0
            j19[0, :3] = raw[0]
            j19[15:, :3] = raw[0]
            bodies.append({"id": a, "joints19": j19.ravel().tolist()})
        with open(os.path.join(anno, f"body3DScene_{t:08d}.json"), "w") as f:
            json.dump({"version": 0.7, "univTime": float(t), "bodies": bodies}, f)

    dump = {}
    for t in range(scene.num_frames):
        dets = np.zeros((scene.num_cameras, 8, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, 8), bool)
        for c, d in enumerate(scene.detections_list(t)):
            n = min(len(d), 8)
            dets[c, :n] = d[:n]
            mask[c, :n] = True
        dump[t] = dets_to_dump_frame(dets, mask)
    dump_path = os.path.join(root, "detections_dump.pkl")
    save_detection_dump(dump_path, dump)

    paths = {"root": root, "dump": dump_path}
    if with_weights:
        paths.update(_fabricate_tiny_weights(root))

    cfg = {
        "TEST_FUNCTION": "PersonTrack_Project3DPose",
        "PIPELINE_COMBINATION": {
            "DETECT_MODEL": "YOLOv3",
            "POSE_MODEL": "HRPose",
            "PERSON_MATCHER": "Iterative",
            "BUILD_3D": "SVD",
            "CONF_THRESHOLD": 0.4,
        },
        "DATASET": {
            "TEST_DATASET": "Panoptic",
            "ROOT": root,
            "FOLDERS_ORDER": folders,
            "CALIBRATION_FILE": "camera_parameter.pickle",
            "DATA_FORMAT": f"*.{image_format}",
            "TEST_RANGE": [0, scene.num_frames],
            "EVAL_RANGE": [[0, scene.num_frames]],
        },
        **_tiny_model_cfg_sections(paths),
        "PERSON_MATCHERS": {
            "ITERATIVE": {
                "NAME": "Iterative", "EPI_THRESHOLD": 25, "INIT_THRESHOLD": 15,
                "JOINT_THRESHOLD": 15, "NUM_JOINTS": 17, "INIT_METHOD": "GD",
                "N_INIT": 3, "MAX_AGE": 10, "W2D": 0.4, "ALPHA2D": 30,
                "W3D": 0.6, "ALPHA3D": 0.25, "LAMBDA_A": 3, "LAMBDA_T": 5,
                "SIGMA": 0.6, "ARM_SIGMA": 0.8,
            },
        },
        "OUTPUT": os.path.join(root, "results"),
    }
    cfg_dir = os.path.join(root, "configs", "Panoptic")
    os.makedirs(cfg_dir, exist_ok=True)
    cfg_path = os.path.join(cfg_dir, "model_configs.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    paths["yaml"] = cfg_path
    paths["config_dir"] = os.path.join(root, "configs")
    return cfg_path, paths


def _fabricate_tiny_weights(root):
    """Random tiny checkpoints in REAL converted formats (.weights / .pth)."""
    import jax

    from tpupose.models.convert import (
        params_to_darknet_array,
        tree_to_torch_state_dict,
        write_darknet_file,
    )
    from tpupose.models.hrnet import HRNetConfig, hrnet_init
    from tpupose.models.yolov3 import YoloConfig, yolov3_init

    det_cfg = YoloConfig(num_classes=2, input_size=64, width_mult=1 / 16,
                         max_candidates=8)
    det_params = yolov3_init(jax.random.PRNGKey(0), det_cfg)
    yolo_path = os.path.join(root, "tiny_yolo.weights")
    write_darknet_file(
        yolo_path, {"major": 0, "minor": 2, "revision": 0, "seen": 1},
        params_to_darknet_array(det_params, det_cfg),
    )

    pose_cfg = HRNetConfig(
        width=8, input_size=(96, 64), stem_channels=16, layer1_blocks=1,
        layer1_planes=8, stage_modules=(1, 1, 1), stage_blocks=1,
    )
    pose_params = hrnet_init(jax.random.PRNGKey(1), pose_cfg)
    hrnet_path = os.path.join(root, "tiny_hrnet.pth")
    try:
        import torch

        sd = {
            k: torch.from_numpy(np.asarray(v).copy())
            for k, v in tree_to_torch_state_dict(pose_params).items()
        }
        torch.save(sd, hrnet_path)
    except ImportError:
        hrnet_path = ""
    return {"yolo_weights": yolo_path, "hrnet_checkpoint": hrnet_path}
