"""Full-size dress rehearsal of the REAL pretrained-artifact pipeline.

The schema tests (tests/test_real_artifact_schema.py) pin the converters'
key layout against the official checkpoints; this script proves the whole
ingestion path end-to-end at the REAL sizes and in the REAL serialization
formats, which the schema tests (eval_shape, in-memory dicts) cannot:

  1. fabricates `pose_hrnet_w48_384x288.pth` as an actual torch zipfile
     checkpoint (torch.save) carrying EXACTLY the official 1,754 keys —
     including `num_batches_tracked` int64 scalars — at the official
     shapes (63,595,745 trainable params, ~254 MB);
  2. fabricates `yolov3.weights` as an actual darknet v0.2 binary of
     exactly 248,007,048 bytes (20-byte header + 62,001,757 float32s —
     the public download's byte size);
  3. runs `python -m tpupose.cli.convert` on a Campus-schema YAML pointing
     at them (torch.load weights_only path, full-size darknet parse with
     exact-consumption assert, BN fold at scale, orbax save);
  4. reloads the bundle torch-free (`load_bundle`) and verifies numerics:
     the unfolded final_layer weights survive .pth -> tree -> fold ->
     orbax -> restore bit-exactly (final_layer has no BN, so folding only
     casts it), and the YOLO detection-head biases survive the .weights
     byte stream the same way;
  5. optionally (--forward) runs one HRNet-W48 forward on a 384x288 crop
     from the restored tree (slow on CPU: full-size compile + execute).

A first run against the real downloads can then only differ in the
weight VALUES, never in file format, key layout, payload size, or
bundle plumbing. Values are random; accuracy is out of scope here.

Run:  python scripts/fullsize_dress_rehearsal.py [--workdir D] [--forward]
Also wired as an opt-in test: TPUPOSE_FULLSIZE=1 pytest
tests/test_real_artifact_schema.py -k fullsize.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

YOLOV3_WEIGHTS_FLOATS = 62_001_757
YOLOV3_WEIGHTS_BYTES = 248_007_048
POSE_HRNET_W48_TRAINABLE = 63_595_745


def fabricate_pth(path, width=48, seed=0):
    """Write a torch-zipfile checkpoint with the official key set/shapes."""
    import numpy as np
    import torch

    from tests.hrnet_manifest import official_pose_hrnet_manifest

    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in official_pose_hrnet_manifest(width):
        if key.endswith("num_batches_tracked"):
            sd[key] = torch.tensor(4096, dtype=torch.int64)
            continue
        if key.endswith("running_var"):
            arr = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            arr = (rng.standard_normal(shape) * 0.03).astype(np.float32)
        sd[key] = torch.from_numpy(arr)
    torch.save(sd, path)
    return sd


def fabricate_weights(path, seed=1):
    """Write a darknet v0.2 binary with the real payload size (byte-exact).

    All floats positive so the BN running_var slices fold safely."""
    import numpy as np

    from tpupose.models.convert import write_darknet_file

    rng = np.random.default_rng(seed)
    data = rng.uniform(0.01, 1.0, YOLOV3_WEIGHTS_FLOATS).astype(np.float32)
    write_darknet_file(
        path, {"major": 0, "minor": 2, "revision": 0, "seen": 32_013_312},
        data,
    )
    size = os.path.getsize(path)
    assert size == YOLOV3_WEIGHTS_BYTES, size
    return data


def write_config(workdir, pth_path, weights_path):
    """Campus-schema YAML whose model paths point at the fabricated files."""
    src = os.path.join(REPO, "configs", "CampusSeq1", "model_configs.yaml")
    with open(src) as f:
        text = f.read()
    text = text.replace(
        'WEIGHT: "weights/yolov3.weights"', f'WEIGHT: "{weights_path}"'
    )
    text = text.replace(
        "CHECKPOINT_FILE: 'weights/pose_hrnet_w48_384x288.pth'",
        f"CHECKPOINT_FILE: '{pth_path}'",
    )
    assert weights_path in text and pth_path in text
    cfg_dir = os.path.join(workdir, "configs", "CampusSeq1")
    os.makedirs(cfg_dir, exist_ok=True)
    out = os.path.join(cfg_dir, "model_configs.yaml")
    with open(out, "w") as f:
        f.write(text)
    return os.path.join(workdir, "configs")


def run(workdir, forward=False, keep=False):
    import numpy as np

    t0 = time.time()
    os.makedirs(workdir, exist_ok=True)
    pth = os.path.join(workdir, "pose_hrnet_w48_384x288.pth")
    wts = os.path.join(workdir, "yolov3.weights")

    print(f"[1/5] fabricating {pth} (official 1754-key schema) ...")
    sd = fabricate_pth(pth, width=48)
    n_train = sum(
        int(np.prod(tuple(v.shape)))
        for k, v in sd.items()
        if not k.endswith(
            ("running_mean", "running_var", "num_batches_tracked")
        )
    )
    assert n_train == POSE_HRNET_W48_TRAINABLE, n_train
    print(f"      {len(sd)} keys, {n_train:,} trainable params, "
          f"{os.path.getsize(pth) / 1e6:.1f} MB on disk")

    print(f"[2/5] fabricating {wts} (darknet v0.2, byte-exact size) ...")
    raw = fabricate_weights(wts)
    print(f"      {os.path.getsize(wts):,} bytes")

    print("[3/5] running the convert CLI ...")
    config_dir = write_config(workdir, pth, wts)
    bundle = os.path.join(workdir, "bundle")
    from tpupose.cli.convert import main as convert_main

    convert_main(["--dataset", "CampusSeq1", "--config-dir", config_dir,
                  "--out", bundle])

    print("[4/5] reloading the bundle torch-free + numeric spot checks ...")
    from tpupose.cli.common import hrnet_config_from, yolo_config_from
    from tpupose.cli.convert import load_bundle
    from tpupose.data.config import load_config
    from tpupose.models.yolov3 import YoloConfig, conv_in_channels

    cfg = load_config(
        os.path.join(config_dir, "CampusSeq1", "model_configs.yaml")
    )
    det_cfg, pose_cfg = yolo_config_from(cfg), hrnet_config_from(cfg)
    det_params, pose_params = load_bundle(bundle, det_cfg, pose_cfg)

    # final_layer has no BN: folding only casts, so the restored HWIO
    # weights must equal the .pth OIHW weights transposed, in bf16.
    import jax.numpy as jnp

    want = np.asarray(
        sd["final_layer.weight"].numpy().transpose(2, 3, 1, 0), np.float32
    ).astype(jnp.bfloat16)
    got = np.asarray(pose_params["final_layer"]["weight"])
    assert got.dtype == jnp.bfloat16 and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))
    want_b = np.asarray(sd["final_layer.bias"].numpy(),
                        np.float32).astype(jnp.bfloat16)
    got_b = np.asarray(pose_params["final_layer"]["bias"])
    np.testing.assert_array_equal(np.asarray(want_b, np.float32),
                                  np.asarray(got_b, np.float32))

    # YOLO head conv58 (bn=False): its bias is the first cout floats of its
    # file section — recompute the offset from the spec and compare.
    specs, cins = det_cfg.conv_specs, conv_in_channels(det_cfg)
    assert specs == YoloConfig().conv_specs, \
        "Campus YAML must select the real darknet spec"
    off = 0
    for i, ((cout, k, s, bn), cin) in enumerate(zip(specs, cins)):
        if i == 58:
            break
        off += (4 * cout if bn else cout) + cout * cin * k * k
    cout58 = specs[58][0]
    want_bias = raw[off:off + cout58].astype(jnp.bfloat16)
    got_bias = np.asarray(det_params["conv58"]["conv"]["bias"])
    np.testing.assert_array_equal(np.asarray(want_bias, np.float32),
                                  np.asarray(got_bias, np.float32))

    n_pose = sum(np.asarray(x).size for x in _leaves(pose_params))
    n_det = sum(np.asarray(x).size for x in _leaves(det_params))
    print(f"      restored: det {n_det:,} / pose {n_pose:,} folded params; "
          f"final_layer + conv58-bias numerics exact")

    if forward:
        print("[5/5] full-size W48 forward on one 384x288 crop (CPU) ...")
        import jax

        from tpupose.models.hrnet import hrnet_apply

        x = jnp.zeros((1, 384, 288, 3), jnp.bfloat16)
        y = jax.jit(
            lambda p, x: hrnet_apply(p, pose_cfg, x)
        )(pose_params, x)
        y.block_until_ready()
        assert y.shape == (1, 96, 72, 17), y.shape
        assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))
        print(f"      heatmaps {y.shape}, finite")
    else:
        print("[5/5] forward pass skipped (--forward to enable)")

    if not keep:
        for p in (pth, wts):
            os.remove(p)
        shutil.rmtree(bundle, ignore_errors=True)
    print(f"DRESS REHEARSAL PASSED in {time.time() - t0:.1f}s "
          f"(workdir {workdir})")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/tpupose_fullsize")
    ap.add_argument("--forward", action="store_true",
                    help="also run one full-size W48 forward from the bundle")
    ap.add_argument("--keep", action="store_true",
                    help="keep the fabricated artifacts + bundle on disk")
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    run(args.workdir, forward=args.forward, keep=args.keep)
