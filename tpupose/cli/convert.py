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


def _config_record(cfg) -> dict:
    """JSON-normalized dataclass fields (tuples -> lists, recursively)."""
    return json.loads(json.dumps(dataclasses.asdict(cfg)))


def write_bundle(out_dir, det_cfg, det_params, pose_cfg, pose_params,
                 provenance=None):
    """Save folded serving params + manifest under `out_dir`."""
    from tpupose.models.checkpoint import save_params

    os.makedirs(out_dir, exist_ok=True)
    save_params(os.path.join(out_dir, "det"), det_params)
    save_params(os.path.join(out_dir, "pose"), pose_params)
    manifest = {
        "format": BUNDLE_FORMAT,
        "folded": True,
        "dtype": "bfloat16",
        "det_config": _config_record(det_cfg),
        "pose_config": _config_record(pose_cfg),
        "provenance": provenance or {},
    }
    with open(os.path.join(out_dir, BUNDLE_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_bundle(bundle_dir, det_cfg, pose_cfg):
    """Restore (det_params, pose_params) from a bundle, verifying that the
    manifest's configs match the YAML-derived ones (a bundle converted for a
    different topology/resolution must fail loudly, not produce garbage)."""
    from tpupose.models.checkpoint import restore_params

    with open(os.path.join(bundle_dir, BUNDLE_MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != BUNDLE_FORMAT:
        raise ValueError(
            f"unsupported bundle format {manifest.get('format')!r} "
            f"(expected {BUNDLE_FORMAT})"
        )
    for name, cfg in (("det_config", det_cfg), ("pose_config", pose_cfg)):
        want = _config_record(cfg)
        got = manifest.get(name)
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

    manifest = write_bundle(
        args.out, det_cfg, det_params, pose_cfg, pose_params,
        provenance={
            "dataset": args.dataset,
            "yolo_weights": os.path.abspath(cfg.detect_model.weight),
            "yolo_header": header,
            "hrnet_checkpoint": os.path.abspath(
                cfg.pose_model.checkpoint_file
            ),
        },
    )
    n_det = sum(x.size for x in jax.tree.leaves(det_params))
    n_pose = sum(x.size for x in jax.tree.leaves(pose_params))
    print(f"bundle written to {args.out}")
    print(f"  det:  {n_det:,} folded params  (yolo header {header})")
    print(f"  pose: {n_pose:,} folded params")
    print(f"  manifest: {json.dumps({k: manifest[k] for k in ('format', 'folded', 'dtype')})}")


if __name__ == "__main__":
    main()
