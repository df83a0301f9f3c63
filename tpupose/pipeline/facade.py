"""End-to-end pipeline facade: detect -> crop -> 2D pose -> 3D track.

TPU-native equivalent of the reference's `ivclabpose` class
(`src/ivclabpose.py:100-287`). Key differences by design:
  * the whole per-frame compute (YOLO forward, crop+resize, HRNet forward,
    heatmap decode, tracker step) is ONE jitted XLA program — no host
    round-trips between stages;
  * crops from all cameras form a single HRNet batch (the reference batches
    crops per camera on GPU with batch_size=20);
  * detections use (x, y, score); no (y, x) flipping anywhere.

Backends are pluggable: real YOLO/HRNet params, or `replay` mode that feeds
externally-provided 2D detections straight into the tracker (the fake-backend
strategy from SURVEY.md §4 — also how cached detections are re-scored).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.geometry import CameraSet, make_camera_set
from tpupose.models.hrnet import HRNetConfig, hrnet_apply, normalize_image
from tpupose.models.yolov3 import YoloConfig, detect_people, prepare_yolo_images
from tpupose.ops.heatmap import decode_heatmaps_auto, expand_box_to_aspect
from tpupose.ops.image import crop_and_resize
from tpupose.tracking.tracker import (
    FrameOutput,
    TrackerConfig,
    TrackerState,
    init_state,
    tracker_step,
)

# Fewest sample frames for which int8 activation-scale calibration and the
# drift self-check are trusted without a warning (scripts/calib_size_drift.py
# measures drift vs calibration-set size on the learned W48).
MIN_CALIB_SAMPLES = 8


def _clip_detections(det_cfg, pose_cfg, tcfg, det_params, pose_params, images):
    """Batched detect -> crop -> pose -> decode for N images, padded to the
    tracker's MAX_DETS. Shared by the fused clip program and the stage-A-only
    path so the two can never drift.

    Args:
      images: (N, H, W, 3) uint8/float RGB.
    Returns:
      dets: (N, D, J, 3) (x, y, score); mask: (N, D) bool.
    """
    in_h, in_w = pose_cfg.input_size
    n, h, w, _ = images.shape
    # bf16 end-to-end preprocessing: uint8 values are exact in bf16, the
    # resample matmuls accumulate in f32 on the MXU, and the 720p image
    # tensors cost half the HBM traffic of an f32 pipeline (docs/PERF.md).
    x = images.astype(jnp.bfloat16) / 255.0
    ximg = prepare_yolo_images(det_cfg, x)
    boxes, scores, valid = detect_people(det_params, det_cfg, ximg, (h, w))
    k = boxes.shape[1]
    eboxes = expand_box_to_aspect(boxes.reshape(-1, 4), in_h / in_w)
    crops = jax.vmap(
        lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
    )(x, eboxes.reshape(n, k, 4))
    crops = normalize_image(
        crops.reshape(n * k, in_h, in_w, 3), value_scale=1.0
    )
    heat = hrnet_apply(pose_params, pose_cfg, crops)
    kps = decode_heatmaps_auto(heat, eboxes, refine=pose_cfg.decode_refine)
    kps = kps.reshape(n, k, pose_cfg.num_joints, 3)
    d = tcfg.max_dets
    if k >= d:
        return kps[:, :d], valid[:, :d]
    dets = jnp.zeros((n, d, tcfg.num_joints, 3)).at[:, :k].set(kps)
    mask = jnp.zeros((n, d), bool).at[:, :k].set(valid)
    return dets, mask


def _box_iou(box, others):
    """IoU of one (4,) xyxy box against (M, 4) boxes."""
    x1 = np.maximum(box[0], others[:, 0])
    y1 = np.maximum(box[1], others[:, 1])
    x2 = np.minimum(box[2], others[:, 2])
    y2 = np.minimum(box[3], others[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = np.clip(box[2] - box[0], 0, None) * np.clip(box[3] - box[1], 0, None)
    b = np.clip(others[:, 2] - others[:, 0], 0, None) * np.clip(
        others[:, 3] - others[:, 1], 0, None
    )
    return inter / np.maximum(a + b - inter, 1e-9)


@dataclasses.dataclass
class Pipeline:
    """Holds camera rig, model params, tracker config/state and the compiled
    frame functions."""

    cams: CameraSet
    tracker_cfg: TrackerConfig
    det_cfg: Optional[YoloConfig] = None
    det_params: Optional[dict] = None
    pose_cfg: Optional[HRNetConfig] = None
    pose_params: Optional[dict] = None
    state: Optional[TrackerState] = None

    def __post_init__(self):
        if self.state is None:
            self.state = init_state(self.tracker_cfg)
        self._frame_fn = None
        self._replay_fn = None
        self._detect_fn = None
        self._pose_fn = None

    # -- construction helpers -------------------------------------------------

    @staticmethod
    def camera_set_from_parameter_dict(camera_parameter, width, height,
                                       num_cameras=None) -> CameraSet:
        """Reference `GetCameraParameters` (`src/ivclabpose.py:162-181`)."""
        P = np.asarray(camera_parameter["P"], np.float32)
        K = np.asarray(camera_parameter["K"], np.float32)
        RT = np.asarray(camera_parameter["RT"], np.float32)
        if num_cameras is not None:
            P, K, RT = P[:num_cameras], K[:num_cameras], RT[:num_cameras]
        return make_camera_set(P, K, RT, width, height)

    def track_restart(self):
        self.state = init_state(self.tracker_cfg)

    def pack_models(self):
        """Width-pack the HRNet high-res branch for serving.

        Exact reparameterization (bf16 AND int8 trees): branch-0
        activations (N, H, W, C) -> (N, H, W/2, 2C) with structured-zero
        kernels — ~2x fewer MXU cycles and ~2x less lane-padding HBM
        traffic on the C=width convs that dominate serving
        (tpupose/ops/packing.py, docs/PERF.md round 3). Call after
        `quantize_models` (or directly on the bf16 tree); compiled
        pipeline functions are rebuilt on next use."""
        import dataclasses

        from tpupose.ops.packing import pack_hrnet_branch0

        if self.pose_cfg is None or self.pose_cfg.pack_branch0:
            return
        self.pose_params = pack_hrnet_branch0(self.pose_params)
        self.pose_cfg = dataclasses.replace(self.pose_cfg, pack_branch0=True)
        # compiled programs baked the unpacked config; rebuild lazily
        self._frame_fn = None
        self._pose_fn = None
        self._clip_fn = None
        self._clip_nn_fn = None
        self._clips_nn_fn = None

    def quantize_models(self, sample_images, qat_steps=0, qat_lr=1e-5,
                        qat_batch=8, qat_log=None, check_px=2.5,
                        on_drift="escalate", escalate_steps=900,
                        box_lost_gate=0.25):
        """Switch both backbones to int8 serving mode — SAFELY.

        Calibrates activation scales by running the real preprocess ->
        detect -> crop path on `sample_images` ((N, H, W, 3) uint8/float
        RGB frames, ideally representative of the deployment scenes), then
        swaps the param trees for quantized ones
        (`tpupose.models.quantize`). Compiled pipeline functions pick up
        the new trees automatically (params are jit arguments).

        `qat_steps > 0` upgrades PTQ to LABEL-FREE quantization-aware
        fine-tuning (`quantize.distill_qat`): each backbone's fake-quant
        tree is trained for that many straight-through-estimator steps to
        match its own float outputs on the calibration inputs (split into
        `qat_batch`-sized batches), then requantized. Costs a fwd+bwd
        compile + steps of training per model at convert/startup time;
        serving speed is identical (the shipped tree is the same int8
        structure).

        **Self-check (on by default).** Plain per-tensor PTQ provably
        breaks LEARNED W48 checkpoints (52.6 px decoded error vs bf16's
        0.92 px — docs/PERF.md round 3), so after quantizing, the decoded
        keypoints of the int8 pose tree are compared against the bf16
        tree on the calibration crops (both trees are in hand; one extra
        forward each), and the int8 detector's boxes against the bf16
        detector's. If the median keypoint shift exceeds `check_px`
        (default 2.5 px — the agreement lab's gate, which allows the
        quarter-offset argmax tie of exactly 2 px at stride 4) or more
        than `box_lost_gate` (default 25%) of the bf16 boxes have no
        IoU>=0.5 int8 counterpart, `on_drift` decides:

          * ``"escalate"`` (default): print the measured drift and re-run
            as label-free distill-QAT with `escalate_steps` steps (900 =
            the remedy measured at W48 scale), then re-check; raise
            `QuantizationDriftError` if STILL failing;
          * ``"raise"``: raise `QuantizationDriftError` immediately;
          * ``"warn"``: print the measured drift and keep the PTQ trees;
          * `check_px=None` disables the check entirely.

        Measured on v5e: ~1.25-1.5x per HRNet conv, more on wide YOLO
        layers (docs/PERF.md)."""
        from tpupose.models.hrnet import hrnet_apply
        from tpupose.models.quantize import (
            distill_qat,
            hrnet_skip_ids,
            quantize_hrnet,
            quantize_yolo,
            yolo_skip_ids,
        )
        from tpupose.models.yolov3 import prepare_yolo_images as _prep
        from tpupose.models.yolov3 import yolov3_apply

        if on_drift not in ("escalate", "raise", "warn"):
            raise ValueError(f"on_drift must be escalate/raise/warn, "
                             f"got {on_drift!r}")

        def batched(arr):
            m = max(1, min(qat_batch, arr.shape[0]))
            return [arr[i:i + m] for i in range(0, arr.shape[0], m)]

        det_bf16, pose_bf16 = self.det_params, self.pose_params
        x = jnp.asarray(sample_images)
        n, h, w, _ = x.shape
        if n < MIN_CALIB_SAMPLES:
            # Measured on the learned W48 (scripts/calib_size_drift.py):
            # scales calibrated on 1 frame's crops drift materially more
            # on held-out crops than the self-check (which runs on those
            # same calibration crops) reports — the check can pass on its
            # own blind spot. 8+ frames close the gap.
            print(
                f"WARNING: int8 calibration + self-check running on only "
                f"{n} sample frame(s) (< {MIN_CALIB_SAMPLES}); the "
                "activation scales AND the drift check may not represent "
                "the deployment scenes — pass more frames "
                "(--int8-calib >= 8)"
            )
        # calibrate on the SAME bf16 preprocessing the fused programs run
        xf = x.astype(jnp.bfloat16) / 255.0
        ximg = _prep(self.det_cfg, xf)
        # Reference boxes/crops/keypoints from the bf16 trees: the pose
        # calibration crops and the self-check baseline in one pass.
        boxes, _, valid = detect_people(det_bf16, self.det_cfg, ximg, (h, w))
        in_h, in_w = self.pose_cfg.input_size
        k = boxes.shape[1]
        eboxes = expand_box_to_aspect(boxes.reshape(-1, 4), in_h / in_w)
        crops = jax.vmap(
            lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
        )(xf, eboxes.reshape(n, k, 4))
        crops = normalize_image(
            crops.reshape(n * k, in_h, in_w, 3), value_scale=1.0
        )

        def quantize_both(steps):
            if steps > 0:
                det_q = distill_qat(
                    lambda p, b: yolov3_apply(p, self.det_cfg, b),
                    det_bf16, self.det_cfg, batched(ximg),
                    steps=steps, lr=qat_lr,
                    skip_ids=yolo_skip_ids(det_bf16, self.det_cfg),
                    log=qat_log,
                )
                pose_q = distill_qat(
                    lambda p, b: hrnet_apply(p, self.pose_cfg, b),
                    pose_bf16, self.pose_cfg, batched(crops),
                    steps=steps, lr=qat_lr,
                    skip_ids=hrnet_skip_ids(pose_bf16),
                    log=qat_log,
                )
            else:
                det_q = quantize_yolo(det_bf16, self.det_cfg, ximg)
                pose_q = quantize_hrnet(pose_bf16, self.pose_cfg, crops)
            return det_q, pose_q

        det_q, pose_q = quantize_both(qat_steps)

        if check_px is not None:
            report = self._quant_self_check(
                det_bf16, pose_bf16, det_q, pose_q,
                ximg, (h, w), crops, eboxes, valid,
            )
            failed = (report["kps_median_px"] > check_px
                      or report["box_lost_frac"] > box_lost_gate)
            msg = ("int8 self-check: keypoint shift median "
                   f"{report['kps_median_px']:.2f} px / p95 "
                   f"{report['kps_p95_px']:.2f} px vs bf16 (gate "
                   f"{check_px} px); boxes lost "
                   f"{report['box_lost_frac'] * 100:.1f}% (gate "
                   f"{box_lost_gate * 100:.0f}%) "
                   f"[checked on {n} frames / {crops.shape[0]} crops]")
            if failed and on_drift == "escalate" and qat_steps == 0:
                print(f"{msg} -> FAILED; escalating to label-free "
                      f"distill-QAT ({escalate_steps} steps, the remedy "
                      "measured at W48 scale — docs/PERF.md)")
                det_q, pose_q = quantize_both(escalate_steps)
                report = self._quant_self_check(
                    det_bf16, pose_bf16, det_q, pose_q,
                    ximg, (h, w), crops, eboxes, valid,
                )
                failed = (report["kps_median_px"] > check_px
                          or report["box_lost_frac"] > box_lost_gate)
                msg = ("int8 self-check after distill-QAT: keypoint "
                       "shift median "
                       f"{report['kps_median_px']:.2f} px / p95 "
                       f"{report['kps_p95_px']:.2f} px; boxes lost "
                       f"{report['box_lost_frac'] * 100:.1f}%")
            if failed and on_drift in ("raise", "escalate"):
                from tpupose.models.quantize import QuantizationDriftError

                raise QuantizationDriftError(
                    f"{msg} — refusing to serve a provably-drifted int8 "
                    "model. Remedies: more/representative --int8-calib "
                    "frames, --qat-steps 900, or on_drift='warn' to "
                    "override."
                )
            print(msg + (" -> FAILED (continuing: on_drift='warn')"
                         if failed else " -> ok"))
            self.last_quant_report = report

        self.det_params = det_q
        self.pose_params = pose_q

    def _quant_self_check(self, det_bf16, pose_bf16, det_q, pose_q,
                          ximg, hw, crops, eboxes, valid):
        """Decoded-keypoint + box drift of the quantized trees vs the bf16
        trees on the calibration inputs. Returns summary stats (floats)."""
        from tpupose.models.hrnet import hrnet_apply

        def decode(p):
            heat = hrnet_apply(p, self.pose_cfg, crops)
            return decode_heatmaps_auto(
                heat, eboxes, refine=self.pose_cfg.decode_refine
            )

        kps_ref = decode(pose_bf16)   # (n*k, J, 3)
        kps_q = decode(pose_q)
        vmask = np.asarray(valid).reshape(-1)
        shift = np.linalg.norm(
            np.asarray(kps_q[..., :2], np.float32)
            - np.asarray(kps_ref[..., :2], np.float32), axis=-1,
        )[vmask]
        if shift.size == 0:
            # no people in the calibration frames — keypoint drift is
            # unknowable; report 0 but flag it
            kps_median = kps_p95 = 0.0
            print("int8 self-check: WARNING — no detections in the "
                  "calibration frames; keypoint drift not assessed. "
                  "Use frames that contain people.")
        else:
            kps_median = float(np.median(shift))
            kps_p95 = float(np.percentile(shift, 95))

        boxes_ref, _, valid_ref = detect_people(
            det_bf16, self.det_cfg, ximg, hw
        )
        boxes_q, _, valid_q = detect_people(det_q, self.det_cfg, ximg, hw)
        br = np.asarray(boxes_ref, np.float32)
        bq = np.asarray(boxes_q, np.float32)
        vr = np.asarray(valid_ref)
        vq = np.asarray(valid_q)
        lost = total = 0
        for i in range(br.shape[0]):
            for j in np.flatnonzero(vr[i]):
                total += 1
                if not vq[i].any():
                    lost += 1
                    continue
                iou = _box_iou(br[i, j], bq[i][vq[i]])
                if iou.max() < 0.5:
                    lost += 1
        return {
            "kps_median_px": kps_median,
            "kps_p95_px": kps_p95,
            "kps_n": int(shift.size),
            "box_lost_frac": (lost / total) if total else 0.0,
            "box_n": total,
        }

    # -- staged API (mirrors PersonDetect / PersonPoseDetect /
    #    PersonTrack_Project3DPose) -------------------------------------------

    def person_detect(self, images):
        """images: (C, H, W, 3) uint8/float RGB -> (boxes, scores, valid)."""
        if self._detect_fn is None:
            det_cfg = self.det_cfg

            @jax.jit
            def fn(params, images):
                # same bf16 preprocessing as the fused frame/clip programs
                # (_clip_detections) so staged detections cannot drift from
                # them on borderline score/NMS decisions
                x = images.astype(jnp.bfloat16) / 255.0
                x = prepare_yolo_images(det_cfg, x)
                return detect_people(
                    params, det_cfg, x, (images.shape[1], images.shape[2])
                )

            self._detect_fn = fn
        return self._detect_fn(self.det_params, jnp.asarray(images))

    def person_pose_detect(self, images, boxes, box_valid):
        """Top-down 2D pose on detection crops, batched across all cameras.

        Returns (C, K, J, 3) keypoints (x, y, score) and a (C, K) mask.
        """
        if self._pose_fn is None:
            pose_cfg = self.pose_cfg
            in_h, in_w = pose_cfg.input_size

            @jax.jit
            def fn(params, images, boxes):
                c, k = boxes.shape[0], boxes.shape[1]
                aspect = in_h / in_w
                eboxes = expand_box_to_aspect(boxes.reshape(-1, 4), aspect)
                # bf16 crop path, pinned to _clip_detections' preprocessing
                crops = jax.vmap(
                    lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
                )(images.astype(jnp.bfloat16) / 255.0, eboxes.reshape(c, k, 4))
                crops = normalize_image(
                    crops.reshape(c * k, in_h, in_w, 3), value_scale=1.0
                )
                heat = hrnet_apply(params, pose_cfg, crops)
                kps = decode_heatmaps_auto(
                    heat, eboxes, refine=pose_cfg.decode_refine
                )
                return kps.reshape(c, k, pose_cfg.num_joints, 3)

            self._pose_fn = fn
        kps = self._pose_fn(self.pose_params, jnp.asarray(images), boxes)
        return kps, box_valid

    def person_track(self, frame_id, detections, det_mask):
        """One tracker step; returns FrameOutput (updates self.state)."""
        if self._replay_fn is None:
            self._replay_fn = jax.jit(
                partial(tracker_step, self.tracker_cfg)
            )
        self.state, out = self._replay_fn(
            self.cams, self.state, detections, det_mask, jnp.int32(frame_id)
        )
        return out

    # -- fused per-frame program ----------------------------------------------

    def process_frame(self, frame_id, images):
        """Full detect+pose+track for one multi-view frame as one jitted call.

        Args:
          images: (C, H, W, 3) uint8 RGB.
        Returns:
          (FrameOutput, detections, det_mask)
        """
        if self._frame_fn is None:
            det_cfg, pose_cfg, tcfg = self.det_cfg, self.pose_cfg, self.tracker_cfg
            in_h, in_w = pose_cfg.input_size

            @jax.jit
            def fn(det_params, pose_params, cams, state, images, frame_id):
                # identical preprocessing to _clip_detections (bf16; the
                # clip-vs-frame equivalence tests pin the two together)
                x = images.astype(jnp.bfloat16) / 255.0
                ximg = prepare_yolo_images(det_cfg, x)
                boxes, scores, valid = detect_people(
                    det_params, det_cfg, ximg, (images.shape[1], images.shape[2])
                )
                c, k = boxes.shape[0], boxes.shape[1]
                eboxes = expand_box_to_aspect(
                    boxes.reshape(-1, 4), in_h / in_w
                ).reshape(c, k, 4)
                crops = jax.vmap(
                    lambda img, bxs: crop_and_resize(img, bxs, (in_h, in_w))
                )(x, eboxes)
                crops = normalize_image(
                    crops.reshape(c * k, in_h, in_w, 3), value_scale=1.0
                )
                heat = hrnet_apply(pose_params, pose_cfg, crops)
                kps = decode_heatmaps_auto(
                    heat, eboxes.reshape(-1, 4), refine=pose_cfg.decode_refine
                )
                kps = kps.reshape(c, k, pose_cfg.num_joints, 3)
                # pad/trim detections to the tracker's MAX_DETS
                d = tcfg.max_dets
                if k >= d:
                    dets, mask = kps[:, :d], valid[:, :d]
                else:
                    dets = jnp.zeros((c, d, tcfg.num_joints, 3)).at[:, :k].set(kps)
                    mask = jnp.zeros((c, d), bool).at[:, :k].set(valid)
                new_state, out = tracker_step(tcfg, cams, state, dets, mask, frame_id)
                return new_state, out, dets, mask

            self._frame_fn = fn
        self.state, out, dets, mask = self._frame_fn(
            self.det_params, self.pose_params, self.cams, self.state,
            jnp.asarray(images), jnp.int32(frame_id),
        )
        return out, dets, mask

    # -- two-stage clip mode ----------------------------------------------------

    def process_clip_nn(self, clip_images):
        """Stage A only: batched YOLO+HRNet detections for a whole clip.

        Returns ((F, C, D, J, 3) detections, (F, C, D) mask) on device —
        the input the scanned tracker (stage B) consumes. Used by the
        throughput benchmark to time the NN and tracker stages separately
        (the tracker's cost is data-dependent, so it is benched on
        realistic detections rather than the random-frame garbage this
        stage produces from random weights).
        """
        if getattr(self, "_clip_nn_fn", None) is None:
            det_cfg, pose_cfg, tcfg = self.det_cfg, self.pose_cfg, self.tracker_cfg

            @jax.jit
            def fn(det_params, pose_params, clip):
                f, c, h, w, _ = clip.shape
                dets, mask = _clip_detections(
                    det_cfg, pose_cfg, tcfg, det_params, pose_params,
                    clip.reshape(f * c, h, w, 3),
                )
                k = dets.shape[1]
                return (
                    dets.reshape(f, c, k, tcfg.num_joints, 3),
                    mask.reshape(f, c, k),
                )

            self._clip_nn_fn = fn
        return self._clip_nn_fn(
            self.det_params, self.pose_params, jnp.asarray(clip_images)
        )

    def process_clips_nn(self, clips):
        """Stage A for a BATCH of clips as one device-resident scan.

        Args:
          clips: (B, F, C, H, W, 3) uint8 RGB.
        Returns:
          ((B, F, C, D, J, 3) detections, (B, F, C, D) mask).

        One dispatch for B clips: the continuous-serving shape (a local
        TPU deployment keeps the NN loop device-resident; per-dispatch
        relay/host overhead is not part of the chip's throughput)."""
        if getattr(self, "_clips_nn_fn", None) is None:
            det_cfg, pose_cfg, tcfg = self.det_cfg, self.pose_cfg, self.tracker_cfg

            @jax.jit
            def fn(det_params, pose_params, clips):
                b, f, c, h, w, _ = clips.shape

                def body(carry, clip):
                    dets, mask = _clip_detections(
                        det_cfg, pose_cfg, tcfg, det_params, pose_params,
                        clip.reshape(f * c, h, w, 3),
                    )
                    k = dets.shape[1]
                    return carry, (
                        dets.reshape(f, c, k, tcfg.num_joints, 3),
                        mask.reshape(f, c, k),
                    )

                _, (ds, ms) = jax.lax.scan(body, 0, clips)
                return ds, ms

            self._clips_nn_fn = fn
        return self._clips_nn_fn(
            self.det_params, self.pose_params, jnp.asarray(clips)
        )

    def process_clip(self, frame_ids, clip_images):
        """Batched-NN + scanned-tracker clip pipeline (throughput mode).

        The tracker never feeds back into detection (verified against the
        reference: nothing in `tracking()` touches the detectors — SURVEY.md
        §7.3), so stage A runs YOLO + HRNet for ALL frames of the clip as one
        big batch (F*C images, F*C*K crops — large batches amortize TPU
        per-op overhead: measured 2.0 -> 0.78 ms/crop from batch 20 -> 128 on
        v5e), and stage B scans the sequential tracker recurrence over the
        frames on-device.

        Args:
          frame_ids: (F,) int32.
          clip_images: (F, C, H, W, 3) uint8 RGB.
        Returns:
          FrameOutput stacked over F.
        """
        if getattr(self, "_clip_fn", None) is None:
            det_cfg, pose_cfg, tcfg = self.det_cfg, self.pose_cfg, self.tracker_cfg

            @partial(jax.jit, donate_argnums=(3,))
            def fn(det_params, pose_params, cams, state, clip, frame_ids):
                f, c, h, w, _ = clip.shape
                dets, mask = _clip_detections(
                    det_cfg, pose_cfg, tcfg, det_params, pose_params,
                    clip.reshape(f * c, h, w, 3),
                )
                d = dets.shape[1]
                dets = dets.reshape(f, c, d, tcfg.num_joints, 3)
                mask = mask.reshape(f, c, d)

                def body(st, xs):
                    dd, mm, fid = xs
                    st, out = tracker_step(tcfg, cams, st, dd, mm, fid)
                    return st, out

                new_state, outs = jax.lax.scan(body, state, (dets, mask, frame_ids))
                return new_state, outs, dets, mask

            self._clip_fn = fn
        self.state, outs, dets, mask = self._clip_fn(
            self.det_params, self.pose_params, self.cams, self.state,
            jnp.asarray(clip_images), jnp.asarray(frame_ids, jnp.int32),
        )
        return outs, dets, mask

    # -- output harvesting -----------------------------------------------------

    def harvest(self, out: FrameOutput, frame_id, timestamp=None):
        """Convert FrameOutput into the reference's artifact structures:
        per-frame (N, 3, 17) pose array + per-camera 2D annotations
        (`src/ivclabpose.py:259-287`, `src/evalmodel.py:83-86`)."""
        valid = np.asarray(out.valid)
        ids = np.asarray(out.track_id)[valid]
        poses3d = np.asarray(out.pose3d)[valid]
        pts3d = [np.transpose(p) for p in poses3d]  # stored (3, 17) like ref
        annotations = []
        pose2d = np.asarray(out.pose2d)[valid]
        now = np.asarray(out.pose2d_now)[valid]
        for i, tid in enumerate(ids):
            for cid in range(pose2d.shape[1]):
                if now[i, cid]:
                    annotations.append(
                        {
                            "timestamp": timestamp if timestamp is not None else frame_id,
                            "cid": cid,
                            "pid": int(tid),
                            "pose": pose2d[i, cid, :, :2],
                            "scores": pose2d[i, cid, :, 2],
                        }
                    )
        return np.asarray(pts3d), ids, annotations
