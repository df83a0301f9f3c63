"""Offline weight conversion: torch/darknet checkpoints -> orbax bundle.

The reference re-parses `yolov3.weights` + `pose_hrnet_w48_384x288.pth`
at startup of every run (`src/ivclabpose.py:116-132`). Here conversion
happens ONCE:

    python -m tpupose.cli.convert --dataset CampusSeq1 --out /path/bundle

writes a torch-free serving bundle — BN-folded bf16 param trees (the
serving form documented in docs/PERF.md) saved via orbax, plus a
`bundle.json` manifest pinning the model configs the weights were
converted for. `testmodel` / `evalmodel` then load it with `--bundle DIR`
without importing torch at all (serving hosts need neither torch nor the
original checkpoint files).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os


BUNDLE_MANIFEST = "bundle.json"
BUNDLE_FORMAT = 1

#: Config fields that select a serving-time execution mode without
#: changing the stored weights: a bundle converted under one value loads
#: fine under another, so they are excluded from the manifest match.
#: (`pack_branch0` is NOT here — packing transforms the tree itself.)
SERVING_ONLY_FIELDS = frozenset({"decode_refine", "int8_resident"})


def _config_record(cfg) -> dict:
    """JSON-normalized dataclass fields (tuples -> lists, recursively)."""
    return json.loads(json.dumps(dataclasses.asdict(cfg)))


def write_bundle(out_dir, det_cfg, det_params, pose_cfg, pose_params,
                 provenance=None, dtype="bfloat16", quantized=False):
    """Save folded serving params + manifest under `out_dir`."""
    from tpupose.models.checkpoint import save_params

    os.makedirs(out_dir, exist_ok=True)
    save_params(os.path.join(out_dir, "det"), det_params)
    save_params(os.path.join(out_dir, "pose"), pose_params)
    manifest = {
        "format": BUNDLE_FORMAT,
        "folded": True,
        "dtype": dtype,
        "quantized": bool(quantized),
        "det_config": _config_record(det_cfg),
        "pose_config": _config_record(pose_cfg),
        "provenance": provenance or {},
    }
    with open(os.path.join(out_dir, BUNDLE_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_manifest(bundle_dir) -> dict:
    with open(os.path.join(bundle_dir, BUNDLE_MANIFEST)) as f:
        return json.load(f)


def load_bundle(bundle_dir, det_cfg, pose_cfg):
    """Restore (det_params, pose_params) from a bundle, verifying that the
    manifest's configs match the YAML-derived ones (a bundle converted for a
    different topology/resolution must fail loudly, not produce garbage)."""
    from tpupose.models.checkpoint import restore_params

    manifest = read_manifest(bundle_dir)
    if manifest.get("format") != BUNDLE_FORMAT:
        raise ValueError(
            f"unsupported bundle format {manifest.get('format')!r} "
            f"(expected {BUNDLE_FORMAT})"
        )
    for name, cfg in (("det_config", det_cfg), ("pose_config", pose_cfg)):
        want = {k: v for k, v in _config_record(cfg).items()
                if k not in SERVING_ONLY_FIELDS}
        got = {k: v for k, v in (manifest.get(name) or {}).items()
               if k not in SERVING_ONLY_FIELDS}
        if got != want:
            diff = {
                k: (got.get(k), want.get(k))
                for k in sorted(set(got) | set(want))
                if got.get(k) != want.get(k)
            }
            raise ValueError(
                f"bundle {name} does not match the dataset YAML config; "
                f"mismatched fields (bundle, yaml): {diff}"
            )
    det_params = restore_params(os.path.join(bundle_dir, "det"))
    pose_params = restore_params(os.path.join(bundle_dir, "pose"))
    return det_params, pose_params


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="CampusSeq1",
                        help="CampusSeq1, Shelf, Panoptic")
    parser.add_argument("--config-dir", type=str, default="configs")
    parser.add_argument("--out", type=str, required=True,
                        help="output bundle directory")
    parser.add_argument("--int8", action="store_true",
                        help="also post-training-quantize (PTQ) with "
                             "activation scales calibrated on dataset "
                             "frames — the bundle then IS the documented "
                             "int8 serving configuration and serving needs "
                             "no calibration pass at all")
    parser.add_argument("--int8-calib", type=int, default=8,
                        help="number of leading dataset frames whose views "
                             "feed the --int8 calibration pass (same frames "
                             "evalmodel --int8 --int8-calib would use; "
                             "default 8 — see scripts/calib_size_drift.py; "
                             "<8 prints a warning)")
    parser.add_argument("--qat-steps", type=int, default=0,
                        help="with --int8: label-free QAT — fine-tune each "
                             "backbone for N straight-through steps against "
                             "its own float outputs on the calibration "
                             "frames before requantizing "
                             "(tpupose.models.quantize.distill_qat). The "
                             "natural place to pay the cost: once, at "
                             "convert time; the bundle ships the result. "
                             "0 = PTQ first, auto-escalating to QAT only "
                             "if the int8-vs-bf16 self-check fails")
    parser.add_argument("--int8-on-drift", type=str, default="escalate",
                        choices=["escalate", "raise", "warn"],
                        help="when the post-quantize self-check fails: "
                             "escalate = auto-upgrade to distill-QAT and "
                             "re-check; raise = refuse to write the "
                             "bundle; warn = print and ship anyway")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpupose.cli.common import hrnet_config_from, yolo_config_from
    from tpupose.data.config import load_config
    from tpupose.models.convert import (
        load_darknet_weights,
        load_hrnet_torch_checkpoint,
    )
    from tpupose.models.layers import fold_batchnorm

    cfg = load_config(
        os.path.join(args.config_dir, args.dataset, "model_configs.yaml")
    )
    det_cfg = yolo_config_from(cfg)
    pose_cfg = hrnet_config_from(cfg)

    det_raw, header = load_darknet_weights(cfg.detect_model.weight, det_cfg)
    pose_raw = load_hrnet_torch_checkpoint(cfg.pose_model.checkpoint_file)
    det_params = fold_batchnorm(det_raw, dtype=jnp.bfloat16)
    pose_params = fold_batchnorm(pose_raw, dtype=jnp.bfloat16)
    dtype, quantized, calib_frames = "bfloat16", False, 0

    if args.int8:
        # Calibrate on the SAME leading dataset frames (and through the
        # same Pipeline.quantize_models path) that
        # `evalmodel --int8 --int8-calib N` uses, so the bundled trees are
        # bit-identical to the in-process serving configuration.
        import numpy as np

        from tpupose.cli.common import (
            build_pipeline_real,
            dataset_frame_source,
            load_camera_parameter,
        )

        camera_parameter = load_camera_parameter(cfg)
        source = dataset_frame_source(cfg)
        head = []
        for item in source:
            head.append(item)
            if len(head) >= max(args.int8_calib, 1):
                break
        if not head:
            raise FileNotFoundError(
                "no dataset frames available for --int8 calibration "
                f"(dataset root {cfg.dataset.root!r})"
            )
        images0 = head[0][2]
        pipe = build_pipeline_real(
            cfg, camera_parameter, images0.shape[2], images0.shape[1]
        )
        print(f"--int8: calibrating + self-checking on frames "
              f"{[int(item[0]) for item in head]}")
        pipe.quantize_models(
            np.concatenate([item[2] for item in head], axis=0),
            qat_steps=args.qat_steps,
            qat_log=lambda i, l: print(f"  qat step {i}: loss={l:.6f}"),
            on_drift=args.int8_on_drift,
        )
        det_params, pose_params = pipe.det_params, pipe.pose_params
        dtype, quantized, calib_frames = "int8", True, len(head)

    manifest = write_bundle(
        args.out, det_cfg, det_params, pose_cfg, pose_params,
        dtype=dtype, quantized=quantized,
        provenance={
            "dataset": args.dataset,
            "yolo_weights": os.path.abspath(cfg.detect_model.weight),
            "yolo_header": header,
            "hrnet_checkpoint": os.path.abspath(
                cfg.pose_model.checkpoint_file
            ),
            "int8_calib_frames": calib_frames,
            "int8_qat_steps": args.qat_steps if args.int8 else 0,
        },
    )
    n_det = sum(x.size for x in jax.tree.leaves(det_params))
    n_pose = sum(x.size for x in jax.tree.leaves(pose_params))
    print(f"bundle written to {args.out}")
    print(f"  det:  {n_det:,} folded params  (yolo header {header})")
    print(f"  pose: {n_pose:,} folded params")
    print(
        "  manifest: "
        + json.dumps(
            {k: manifest[k] for k in ("format", "folded", "dtype", "quantized")}
        )
    )


if __name__ == "__main__":
    main()
