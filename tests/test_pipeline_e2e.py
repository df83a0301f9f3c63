"""End-to-end pipeline tests on synthetic scenes (SURVEY.md §4): replay-mode
detections -> jitted tracker -> artifacts -> PCP ~ 100 at low noise, plus a
full random-weight model pipeline smoke test."""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.data.synthetic import make_scene
from tpupose.eval import coco2shelf3d, evaluate_pcp, write_3d_result
from tpupose.eval.pcp import evaluate_pcp_from_pickle  # noqa: F401  (import check)
from tpupose.geometry import make_camera_set
from tpupose.models.hrnet import hrnet_init, tiny_test_config
from tpupose.models.yolov3 import tiny_yolo_test_config, yolov3_init
from tpupose.pipeline.facade import Pipeline
from tpupose.tracking.tracker import TrackerConfig


def test_replay_pipeline_pcp_near_perfect(tmp_path):
    scene = make_scene(num_frames=40, num_cameras=5, num_actors=3,
                       noise_px=1.0, drop_prob=0.1, seed=7)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=scene.num_cameras)
    pipe = Pipeline(cams=rig, tracker_cfg=tcfg)

    multi_poses3d = {}
    all_annotations = []
    for t in range(scene.num_frames):
        dets = np.zeros((scene.num_cameras, tcfg.max_dets, 17, 3), np.float32)
        mask = np.zeros((scene.num_cameras, tcfg.max_dets), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, :len(d)] = d
            mask[c, :len(d)] = True
        out = pipe.person_track(t, jnp.asarray(dets), jnp.asarray(mask))
        pts3d, ids, anns = pipe.harvest(out, t)
        multi_poses3d[t] = pts3d
        all_annotations.extend(anns)

    # Artifacts round-trip like the reference's pkl.
    pkl = str(tmp_path / "preds.pkl")
    write_3d_result(multi_poses3d, pkl)

    # GT in shelf-14 format via the same converter (format-consistent).
    actors_gt = [
        [coco2shelf3d(scene.gt3d[t, a].T) for t in range(scene.num_frames)]
        for a in range(scene.num_actors)
    ]
    res = evaluate_pcp([[5, scene.num_frames]], multi_poses3d, actors_gt)
    assert res["average"] > 0.99, res["table"]
    assert len(all_annotations) > 0


def test_full_model_pipeline_smoke():
    # Random weights: garbage detections, but the fused frame program must
    # compile and run end-to-end with stable shapes.
    scene = make_scene(num_frames=2, num_cameras=3, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=3, max_dets=8)
    pipe = Pipeline(
        cams=rig,
        tracker_cfg=tcfg,
        det_cfg=det_cfg,
        det_params=yolov3_init(jax.random.PRNGKey(0), det_cfg),
        pose_cfg=pose_cfg,
        pose_params=hrnet_init(jax.random.PRNGKey(1), pose_cfg),
    )
    images = np.zeros((3, 120, 160, 3), np.uint8)
    for t in range(2):
        out, dets, mask = pipe.process_frame(t, images)
        assert dets.shape == (3, tcfg.max_dets, 17, 3)
        assert np.asarray(out.pose3d).shape == (tcfg.max_tracks, 17, 3)

    # Staged API also works.
    boxes, scores, valid = pipe.person_detect(images)
    assert boxes.shape[0] == 3
    kps, m = pipe.person_pose_detect(images, boxes, valid)
    assert kps.shape[2:] == (17, 3)


def test_quantized_pipeline_smoke():
    # int8 serving mode: calibrate on sample frames, then the fused clip
    # program runs with quantized trees and agrees with bf16 to sub-pixel.
    from tpupose.models.layers import fold_batchnorm

    scene = make_scene(num_frames=2, num_cameras=3, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=3, max_dets=8)
    pipe = Pipeline(
        cams=rig,
        tracker_cfg=tcfg,
        det_cfg=det_cfg,
        det_params=fold_batchnorm(yolov3_init(jax.random.PRNGKey(0), det_cfg)),
        pose_cfg=pose_cfg,
        pose_params=fold_batchnorm(hrnet_init(jax.random.PRNGKey(1), pose_cfg)),
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (3, 120, 160, 3), np.uint8)
    clip = np.stack([images, images])  # (F=2, C=3, H, W, 3)
    dets_f, mask_f = pipe.process_clip_nn(clip)

    # box_lost_gate=1.0: a RANDOM-weight tiny YOLO regresses arbitrary box
    # geometry from noise, so the self-check's box axis is undefined here
    # (see tests/test_int8_selfcheck.py); the keypoint axis stays on.
    pipe.quantize_models(images, box_lost_gate=1.0)
    assert "weight_q" in pipe.pose_params["layer1"]["0"]["conv1"]
    dets_q, mask_q = pipe.process_clip_nn(clip)
    assert dets_q.shape == dets_f.shape
    # where both modes report a detection, keypoints agree closely
    both = np.asarray(mask_f) & np.asarray(mask_q)
    if both.any():
        df = np.asarray(dets_f)[both][..., :2]
        dq = np.asarray(dets_q)[both][..., :2]
        d = np.linalg.norm(df - dq, axis=-1)
        assert np.median(d) < 8.0  # heatmap cell = 4 input px at 2 cells


def test_quantize_models_qat_mode():
    # qat_steps>0 upgrades PTQ to label-free distillation QAT inside the
    # pipeline: both backbones come out as real int8 trees and the fused
    # clip program still runs and agrees with bf16 where both detect.
    from tpupose.models.layers import fold_batchnorm
    from tpupose.models.quantize import is_quantized_conv

    scene = make_scene(num_frames=2, num_cameras=3, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    det_cfg = tiny_yolo_test_config()
    pose_cfg = tiny_test_config()
    tcfg = TrackerConfig(num_cameras=3, max_dets=8)
    pipe = Pipeline(
        cams=rig,
        tracker_cfg=tcfg,
        det_cfg=det_cfg,
        det_params=fold_batchnorm(yolov3_init(jax.random.PRNGKey(0), det_cfg)),
        pose_cfg=pose_cfg,
        pose_params=fold_batchnorm(hrnet_init(jax.random.PRNGKey(1), pose_cfg)),
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (3, 120, 160, 3), np.uint8)
    clip = np.stack([images, images])
    dets_f, mask_f = pipe.process_clip_nn(clip)

    logs = []
    # box_lost_gate=1.0 for the same random-weight reason as the smoke test
    pipe.quantize_models(images, qat_steps=6, qat_batch=2,
                         qat_log=lambda i, l: logs.append((i, l)),
                         box_lost_gate=1.0)
    assert is_quantized_conv(pipe.pose_params["layer1"]["0"]["conv1"])
    assert is_quantized_conv(pipe.det_params["conv1"]["conv"])
    # no fake-quant leaves left anywhere in the serving trees
    import jax as _jax

    for tree in (pipe.det_params, pipe.pose_params):
        assert not any(
            "fq_x_scale" in str(p)
            for p, _ in _jax.tree_util.tree_leaves_with_path(tree)
        )
    assert logs  # progress callback fired
    dets_q, mask_q = pipe.process_clip_nn(clip)
    both = np.asarray(mask_f) & np.asarray(mask_q)
    if both.any():
        d = np.linalg.norm(
            np.asarray(dets_f)[both][..., :2] - np.asarray(dets_q)[both][..., :2],
            axis=-1,
        )
        assert np.median(d) < 8.0
