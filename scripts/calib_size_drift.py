"""Int8 self-check drift vs calibration-set size (VERDICT r4 next-round #5).

`--int8-calib` defaulted to 1 frame, and BOTH the activation-scale
calibration AND the drift self-check ran on that single frame's crops —
a user with a real checkpoint could get a self-check that passes on an
unrepresentative sample. This measures, on the LEARNED W48 (the same
generalizing blob-trained model the e2e PCP run uses), how plain-PTQ
drift depends on the number of calibration frames:

  for N in {1, 4, 8, 32} frames (each frame = 5 cams x 2 actors = 10
  crops): calibrate activation scales on the first N frames' crops,
  PTQ-quantize, then report the int8-vs-bf16 decoded-keypoint shift
    (a) on the CALIBRATION crops themselves — what the in-process
        self-check sees, and
    (b) on a HELD-OUT crop set (the last 8 frames, never calibrated on)
        — the truth the self-check is standing in for.

If (a) at N=1 is materially tighter than (b), the old default was
measuring its own blind spot. The measured numbers set the shipped
`--int8-calib` default and the `facade.quantize_models` small-sample
warning threshold.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/calib_size_drift.py \
         --load /tmp/w48_gen_seed0.npz [--frames 40] [--sizes 1,4,8,32]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from int8_w48_agreement import _argval, _fetch, _load_bundle  # noqa: E402

from tpupose.eval.e2e import build_scene_crops, decode_tree  # noqa: E402


def main():
    import jax.numpy as jnp

    from tpupose.models.hrnet import hrnet_w48_config
    from tpupose.models.quantize import quantize_hrnet

    load = _argval("--load")
    if not load:
        sys.exit("--load <bundle.npz> required (train one with "
                 "scripts/int8_e2e_pcp.py --save)")
    folded, _, _ = _load_bundle(load)
    cfg = hrnet_w48_config()

    frames = int(_argval("--frames", 40))
    sizes = [int(s) for s in _argval("--sizes", "1,4,8,32").split(",")]
    holdout_frames = int(_argval("--holdout", 8))

    print(f"building scene + rendering crops ({frames} frames) ...",
          file=sys.stderr, flush=True)
    scene, crops, eboxes = build_scene_crops(cfg, num_frames=frames)
    per_frame = scene.num_cameras * scene.num_actors
    ho = crops[-holdout_frames * per_frame:]
    ho_eb = eboxes[-holdout_frames * per_frame:]

    def shift_stats(a, b):
        s = np.linalg.norm(a[..., :2] - b[..., :2], axis=-1)
        return float(np.median(s)), float(np.quantile(s, 0.95))

    # bf16 references, computed once per crop set
    refine = "quarter"  # the serving default (reference parity)
    bf_ho = decode_tree(folded, cfg, ho, ho_eb, refine, fetch=_fetch)

    print(f"{'N frames':>9} {'crops':>6} | {'calib med/p95 px':>18} | "
          f"{'held-out med/p95 px':>20}")
    for n in sizes:
        calib = crops[: n * per_frame]
        calib_eb = eboxes[: n * per_frame]
        qp = quantize_hrnet(folded, cfg, jnp.asarray(calib))
        bf_c = decode_tree(folded, cfg, calib, calib_eb, refine, fetch=_fetch)
        q_c = decode_tree(qp, cfg, calib, calib_eb, refine, fetch=_fetch)
        q_ho = decode_tree(qp, cfg, ho, ho_eb, refine, fetch=_fetch)
        med_c, p95_c = shift_stats(bf_c, q_c)
        med_h, p95_h = shift_stats(bf_ho, q_ho)
        print(f"{n:>9} {len(calib):>6} | {med_c:8.2f} /{p95_c:8.2f} | "
              f"{med_h:9.2f} /{p95_h:9.2f}", flush=True)


if __name__ == "__main__":
    main()
