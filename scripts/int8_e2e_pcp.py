"""End-to-end int8 accuracy at the metric the reference publishes: 3D PCP
after multi-view triangulation + tracking (`src/evalmodel.py:120-206`).

VERDICT r3 missing #2 / next-round #3: the distill-QAT agreement gate
(`scripts/int8_w48_agreement.py`) stops at decoded 2D keypoints; the claim
that the multi-view epipolar check + greedy view drop absorbs the residual
<5% argmax-jump outliers was asserted, never measured. This script measures
it (machinery in `tpupose/eval/e2e.py`, pinned at tiny scale by
`tests/test_int8_e2e_pcp.py`):

  1. train the real-topology W48 (or W32, `--w32`) on-chip on the blob-
     localization task until its decoded keypoints are accurate to a few
     pixels (the only supervised task in an environment with no datasets —
     same as the agreement lab; reuse a saved bundle with `--load`);
  2. build a synthetic 5-camera scene with known GT 3D, and for every
     (frame, camera, actor) render the model's OWN input distribution — a
     blob crop at the projected GT 2D keypoints (rendered directly in crop
     space; both trees see byte-identical crops, so resampling style cannot
     bias the comparison);
  3. run the crops through the bf16 tree, the distill-QAT int8 tree
     (`--qat-steps`, default 900 — the measured W48 remedy), and the plain
     per-tensor PTQ tree (the configuration docs/PERF.md r3 proved breaks a
     learned W48 — kept as the measured negative control);
  4. decode each (quarter = reference-parity serving default AND parabolic
     = recommended int8 mode), feed the decoded keypoints as detections to
     the full jitted tracker (`track_clip`), harvest per-frame 3D poses,
     and score PCP against the scene GT exactly like the reference.

Exit 0 iff (a) the bf16 BASELINE is near-saturated — average PCP >=
--min-baseline (default 95; the noise-free tiny-scale chain scores >= 99
in tests/test_int8_e2e_pcp.py) AND every bone group scores > 0 — and (b)
in BOTH decode modes, |PCP(bf16) - PCP(distill int8)| <= --gate (default
1.0) PCP points. The baseline check exists because round 4's first chip
run showed the gate cannot resolve anything at a broken operating point:
a memorizing proxy model scored bf16 47.57 with leg bones 0.00, and int8
landed +3.0 ABOVE bf16 (VERDICT r4 weak #2). The PTQ row is
informational (expected: collapse).

--seed varies the TRAINING run only (the scene is fixed), so two runs
with different seeds measure the bf16 run-to-run scatter that justifies
the gate width (VERDICT r4 next-round #7). --bf16-only skips both
quantized trees (and the int8 delta gate) for exactly that scatter
measurement — the second seed's run needs only the bf16 PCP, not
another 900-step distill-QAT.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_e2e_pcp.py \
         [--w32] [--load bundle.npz | --save bundle.npz] [--frames 40] \
         [--qat-steps 900] [--calib 32] [--seed 0] [--min-baseline 95] \
         [--gate 1.0]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from int8_w48_agreement import (  # noqa: E402
    _argval,
    _fetch,
    _load_bundle,
    _save_bundle,
    learned_w48,
)

from tpupose.eval.e2e import (  # noqa: E402
    build_scene_crops,
    decode_tree,
    pcp_through_tracker,
)


def main():
    import jax.numpy as jnp

    from tpupose.models.hrnet import hrnet_apply
    from tpupose.models.quantize import (
        distill_qat,
        hrnet_skip_ids,
        quantize_hrnet,
    )

    cfg = None
    if "--w32" in sys.argv:
        from tpupose.models.hrnet import hrnet_w32_config

        cfg = hrnet_w32_config()
    elif "--tiny" in sys.argv:
        # CPU smoke of the full orchestration (train -> quantize x2 ->
        # decode x6 -> tracker -> PCP) before committing chip time; the
        # tiny net learns the blob task slowly, so the PCP numbers are
        # NOT evidence — the run exercising every stage is the point.
        from tpupose.models.hrnet import tiny_test_config

        cfg = tiny_test_config()

    load = _argval("--load")
    if load:
        folded, _, _ = _load_bundle(load)
        if cfg is None:
            from tpupose.models.hrnet import hrnet_w48_config

            cfg = hrnet_w48_config()
    else:
        folded, _imgs, _kps, _ = learned_w48(
            steps=int(_argval("--train-steps", 4000)),
            block=int(_argval("--train-block", 200)), cfg=cfg,
            seed=int(_argval("--seed", 0)),
        )
        if cfg is None:
            from tpupose.models.hrnet import hrnet_w48_config

            cfg = hrnet_w48_config()
        save = _argval("--save")
        if save:
            _save_bundle(save, folded, _imgs, _kps)

    frames = int(_argval("--frames", 40))
    qat_steps = int(_argval("--qat-steps", 900))
    n_calib = int(_argval("--calib", 32))
    n_cams = int(_argval("--cams", 5))
    n_actors = int(_argval("--actors", 2))
    scene_obj = None
    if n_cams != 5 or n_actors != 2:
        # Harder operating points (fewer views = less triangulation
        # redundancy) probe WHERE the end-metric gate starts separating
        # int8 recipes — at the default 5-camera scene a well-trained
        # model saturates PCP for every tree incl. plain PTQ (PERF.md r5).
        from tpupose.data.synthetic import make_scene

        scene_obj = make_scene(num_frames=frames, num_cameras=n_cams,
                               num_actors=n_actors, noise_px=0.0, seed=0)
    print(f"building scene + rendering crops ({frames} frames x {n_cams} "
          f"cams x {n_actors} actors) ...", file=sys.stderr, flush=True)
    scene, crops, eboxes = build_scene_crops(cfg, num_frames=frames,
                                             num_actors=n_actors,
                                             scene=scene_obj)

    bf16_only = "--bf16-only" in sys.argv
    if bf16_only:
        trees = (("bf16", folded),)
    else:
        calib = crops[:n_calib]
        print("quantizing: plain PTQ (negative control) ...",
              file=sys.stderr, flush=True)
        ptq = quantize_hrnet(folded, cfg, jnp.asarray(calib))
        print(f"quantizing: distill-QAT {qat_steps} steps (the shipped "
              "escalation remedy) ...", file=sys.stderr, flush=True)
        batches = [jnp.asarray(calib[i:i + 4]) for i in range(0, n_calib, 4)]
        dq = distill_qat(
            lambda p, b: hrnet_apply(p, cfg, b), folded, cfg, batches,
            steps=qat_steps, lr=1e-5, skip_ids=hrnet_skip_ids(folded),
            log=lambda i, l: print(f"  distill step {i}: loss={l:.6f}",
                                   file=sys.stderr, flush=True),
        )
        trees = (("bf16", folded), ("int8-distill", dq), ("int8-ptq", ptq))

    min_baseline = float(_argval("--min-baseline", 95.0))
    gate = float(_argval("--gate", 1.0))
    ok = True
    for refine in ("quarter", "parabolic"):
        pcps = {}
        for name, tree in trees:
            kps = decode_tree(tree, cfg, crops, eboxes, refine, fetch=_fetch)
            res = pcp_through_tracker(scene, kps)
            pcps[name] = res["average"] * 100
            print(f"[decode={refine}] {name}: PCP {pcps[name]:.2f}")
            if name == "bf16":
                print(res["table"])
                # Baseline-saturation gate (VERDICT r4 weak #2): at round
                # 4's broken operating point (memorizing proxy, bf16 47.57,
                # legs 0.00) the |delta|<=1.0 assertion could not resolve
                # anything — int8 scored +3.0 ABOVE bf16. The +-gate claim
                # is only meaningful against a near-saturated baseline with
                # every bone group alive.
                k = min(2, len(res["person_wise"]))
                dead = [
                    g for g, vals in res["bone_person_wise"].items()
                    if not np.nansum(vals[:k]) / k > 0.0
                ]
                if pcps["bf16"] < min_baseline or dead:
                    print(
                        f"[decode={refine}] BASELINE NOT SATURATED: bf16 "
                        f"{pcps['bf16']:.2f} < {min_baseline:.1f} or dead "
                        f"bone groups {dead} — the int8 delta gate cannot "
                        "resolve at this operating point", flush=True,
                    )
                    ok = False
        if bf16_only:
            print(f"[decode={refine}] END-TO-END PCP: bf16 "
                  f"{pcps['bf16']:.2f} (bf16-only scatter run)", flush=True)
            continue
        delta = pcps["int8-distill"] - pcps["bf16"]
        print(
            f"[decode={refine}] END-TO-END PCP: bf16 {pcps['bf16']:.2f}  "
            f"int8-distill {pcps['int8-distill']:.2f} (delta {delta:+.2f}) "
            f" int8-ptq {pcps['int8-ptq']:.2f} (negative control)",
            flush=True,
        )
        if abs(delta) > gate:
            ok = False
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
