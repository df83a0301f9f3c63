"""int8 post-training quantization: exact quant math, calibration capture,
end-to-end agreement of the quantized backbones with the bf16 path.

The quantized path must (a) reproduce hand-computed int8 conv arithmetic
exactly, (b) record one scale per conv in model order, (c) keep skip-listed
convs in float, and (d) keep decoded keypoints within sub-pixel of the
bf16 path on calibrated inputs (heatmap grid is 4 image pixels per cell, so
<=1.0 heatmap px is well inside the tracker's noise floor).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.models.hrnet import hrnet_apply, hrnet_init, tiny_test_config
from tpupose.models.layers import conv_apply, fold_batchnorm
from tpupose.models.quantize import (
    calibrate,
    quantize_convs,
    quantize_hrnet,
    quantize_yolo,
)
from tpupose.models.yolov3 import (
    detect_people,
    tiny_yolo_test_config,
    yolov3_apply,
    yolov3_init,
)


def test_quantized_conv_exact_math():
    # 1x1 conv, no padding effects: y = round(x/sx) @ round(w/sw) * sx*sw
    w = np.array([[0.5, -1.0], [2.0, 0.25]], np.float32)  # (cin=2, cout=2)
    p = {"weight": jnp.asarray(w.reshape(1, 1, 2, 2)), "bias": jnp.array([1.0, -1.0])}
    x = jnp.asarray(np.array([[3.0, -2.0]], np.float32).reshape(1, 1, 1, 2))
    scales = {id(p): 4.0}  # absmax 4 -> x_scale = 4/127
    q = quantize_convs({"c": p}, {id(p): 4.0})["c"]
    assert q["weight_q"].dtype == jnp.int8
    # per-channel w scales: col0 absmax 2 -> 2/127; col1 absmax 1 -> 1/127
    np.testing.assert_allclose(np.asarray(q["w_scale"]), [2 / 127, 1 / 127])
    got = np.asarray(conv_apply(q, x))[0, 0, 0]
    xs, ws = 4.0 / 127, np.array([2 / 127, 1 / 127])
    xq = np.round(np.array([3.0, -2.0]) / xs)
    wq = np.round(w / ws)
    want = (xq @ wq) * xs * ws + np.array([1.0, -1.0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_quantized_conv_zero_padding_exact():
    # zero-point-0 symmetric quantization makes zero padding exact: a
    # constant input's border outputs must equal the interior ratio of the
    # float conv's border outputs.
    rng = np.random.default_rng(0)
    p = {"weight": jnp.asarray(rng.standard_normal((3, 3, 4, 4)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    q = quantize_convs({"c": p}, {id(p): float(np.max(np.abs(x)))})["c"]
    yf = np.asarray(conv_apply(p, x))
    yq = np.asarray(conv_apply(q, x))
    # int8 carries ~2 decimal digits; check the full map within 2% of range
    assert np.max(np.abs(yf - yq)) <= 0.02 * np.max(np.abs(yf))


def test_calibrate_percentile_clips_the_range():
    # percentile calibration must map the requested |x| percentile (not
    # absmax) to 127; a single outlier then stops dominating the scale.
    p = {"weight": jnp.asarray(np.ones((1, 1, 1, 1), np.float32))}
    x = np.ones((1, 1, 100, 1), np.float32)
    x[0, 0, 0, 0] = 1000.0  # one outlier
    x = jnp.asarray(x)
    apply_fn = lambda b: conv_apply(p, b)  # noqa: E731
    absmax = calibrate(apply_fn, x)[id(p)]
    clipped = calibrate(apply_fn, x, percentile=90.0)[id(p)]
    assert abs(absmax - 1000.0) < 1.0
    assert clipped < 2.0  # the 90th percentile of |x| is ~1


def test_calibrate_records_every_conv_and_skips():
    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, *cfg.input_size, 3)),
        jnp.float32,
    )
    scales = calibrate(lambda b: hrnet_apply(params, cfg, b), x)
    n_convs = sum(
        1
        for leaf in jax.tree.leaves(
            jax.tree.map(
                lambda v: getattr(v, "ndim", 0) == 4, params
            )
        )
        if leaf
    )
    assert len(scales) == n_convs  # one scale per conv, none missed
    assert all(v > 0 for v in scales.values())

    qp = quantize_hrnet(params, cfg, x)
    # the heatmap head stays float; stems quantize (uint8/255 inputs)
    assert "weight" in qp["final_layer"]
    assert "weight_q" in qp["conv1"]
    # interior convs are quantized
    assert "weight_q" in qp["layer1"]["0"]["conv1"]


def test_hrnet_int8_keypoints_subpixel_vs_bf16():
    from tpupose.models.quantize import calibrate_bn_stats
    from tpupose.ops.heatmap import decode_heatmaps

    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((4, *cfg.input_size, 3)), jnp.float32)
    # give the random weights trained-network activation statistics first
    # (identity BN stats let the residual stream's variance compound with
    # depth, which no deployed checkpoint resembles and which makes the
    # heatmaps near-tie noise fields — argmax agreement on those is a coin
    # with a slight bias, not a quantization-quality signal)
    raw = hrnet_init(jax.random.PRNGKey(2), cfg)
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )
    params = fold_batchnorm(raw)
    qp = quantize_hrnet(params, cfg, x)

    heat_f = np.asarray(hrnet_apply(params, cfg, x))
    heat_q = np.asarray(hrnet_apply(qp, cfg, x))
    # HEATMAP VALUE error is what quantization perturbs; assert on it
    # directly (measured: median 0.68%, p99 3.6% of range at this
    # operating point — train-mode BN stats, width-8 net where per-tensor
    # input quantization is at its crudest). A random net's heatmaps have
    # no peaks, so argmax agreement there is tie-flipping noise — the
    # argmax claim for trained peaky maps lives in
    # test_int8_learned_accuracy.py.
    rng_h = heat_f.max() - heat_f.min()
    err = np.abs(heat_f - heat_q) / rng_h
    assert np.quantile(err, 0.99) < 0.05, np.quantile(err, 0.99)
    assert np.median(err) < 0.015, np.median(err)
    boxes = jnp.tile(
        jnp.asarray([[0.0, 0.0, cfg.heatmap_size[1], cfg.heatmap_size[0]]]),
        (4, 1),
    )
    kf = np.asarray(decode_heatmaps(jnp.asarray(heat_f), boxes))
    kq = np.asarray(decode_heatmaps(jnp.asarray(heat_q), boxes))
    # even on near-tie fields, most argmaxes should survive (sanity floor)
    d = np.linalg.norm(kf[..., :2] - kq[..., :2], axis=-1)
    assert np.mean(d <= 1.0) >= 0.7, f"mean agreement {np.mean(d <= 1.0)}"


def test_yolo_int8_boxes_close_to_bf16():
    from tpupose.models.quantize import yolo_detection_head_names
    from tpupose.models.yolov3 import yolov3_apply

    cfg = tiny_yolo_test_config()
    params = fold_batchnorm(yolov3_init(jax.random.PRNGKey(4), cfg))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, cfg.input_size, cfg.input_size, 3)), jnp.float32)
    # Raw random head weights produce |logit| ~ 1e4, i.e. exp(wh) overflow —
    # nothing like a trained detector. Normalize each (float-kept) head conv
    # so its logits sit at trained-model magnitudes (absmax ~ 3); backbone
    # quantization error then shows up in the boxes at realistic sensitivity.
    head_outs = yolov3_apply(params, cfg, x)
    for h, out in zip(yolo_detection_head_names(cfg), head_outs):
        s = 3.0 / float(jnp.max(jnp.abs(out)))
        params[h]["conv"]["weight"] = params[h]["conv"]["weight"] * s
        params[h]["conv"]["bias"] = params[h]["conv"]["bias"] * s
    qp = quantize_yolo(params, cfg, x)
    bf, sf, vf = detect_people(params, cfg, x, (cfg.input_size, cfg.input_size))
    bq, sq, vq = detect_people(qp, cfg, x, (cfg.input_size, cfg.input_size))
    # scores shift by at most a few percent of the sigmoid range
    assert float(jnp.max(jnp.abs(sf - sq))) < 0.1
    # BOX fidelity across EVERY anchor/cell candidate, compared positionally
    # on the raw heads (immune to top_k tie reordering between programs):
    # centers in pixels, sizes in log space (pixel-space wh goes through
    # exp(l)*anchor, which amplifies any drift unboundedly for the large
    # anchors — log-space is the faithful sensitivity for box sizes).
    heads_f = yolov3_apply(params, cfg, x)
    heads_q = yolov3_apply(qp, cfg, x)
    for hf, hq, anchors in zip(heads_f, heads_q, cfg.anchors):
        n, gh, gw, _ = hf.shape
        stride = cfg.input_size // gw
        hf = np.asarray(hf).reshape(n, gh, gw, len(anchors), -1)
        hq = np.asarray(hq).reshape(n, gh, gw, len(anchors), -1)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        center_px = np.abs(
            sig(hf[..., :2]) - sig(hq[..., :2])
        ).max() * stride
        assert center_px < 0.02 * cfg.input_size, f"centers drift {center_px}px"
        wh_log = np.abs(hf[..., 2:4] - hq[..., 2:4]).max()
        assert wh_log < 0.15, (  # => box sizes within ~16% everywhere
            f"log-wh drift {wh_log}"
        )


def test_calibrate_bn_stats_normalizes_activations():
    # An unnormalized random residual stack blows activations up
    # exponentially with depth; after BN re-estimation every conv input is
    # O(1) — the statistics a trained+BN checkpoint has. (This underpins
    # the W48-scale int8 agreement check, scripts/int8_w48_agreement.py.)
    from tpupose.models.quantize import calibrate, calibrate_bn_stats

    cfg = tiny_test_config()
    raw = hrnet_init(jax.random.PRNGKey(11), cfg)
    x = jnp.asarray(
        np.random.default_rng(12).random((4, *cfg.input_size, 3)),
        jnp.float32,
    )
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )
    params = fold_batchnorm(raw)
    scales = calibrate(
        lambda b: hrnet_apply(params, cfg, b, compute_dtype=jnp.float32), x
    )
    vals = np.asarray(list(scales.values()))
    assert (vals < 50.0).all() and (vals > 1e-3).all(), (
        vals.min(), vals.max()
    )


def test_calibrate_bn_stats_converges_at_w48_depth():
    # Regression for the Jacobi oscillation: passively tapping BN inputs
    # and writing all stats back in parallel DIVERGES on deep nets (on the
    # real W48 topology, iteration-2 variances hit 1e35 and 87 of 292 BNs
    # collapsed to constants — 2026-08-17). The train-mode pass must be
    # self-consistent at full depth; this runs the REAL (1,4,3)x4 module
    # schedule at width 8 (same BN count/graph depth class as W48).
    from tpupose.models.hrnet import HRNetConfig
    from tpupose.models.quantize import calibrate, calibrate_bn_stats

    cfg = HRNetConfig(
        width=8,
        input_size=(96, 64),
        stem_channels=16,
        layer1_blocks=4,
        layer1_planes=8,
        stage_modules=(1, 4, 3),
        stage_blocks=4,
    )
    raw = hrnet_init(jax.random.PRNGKey(21), cfg)
    x = jnp.asarray(
        np.random.default_rng(22).random((2, *cfg.input_size, 3)),
        jnp.float32,
    )
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )

    stats = []

    def walk(p):
        if isinstance(p, dict):
            if "running_var" in p:
                stats.append(np.asarray(p["running_var"]))
            for v in p.values():
                if isinstance(v, dict):
                    walk(v)

    walk(raw)
    allv = np.concatenate([s.ravel() for s in stats])
    assert np.isfinite(allv).all()
    assert allv.max() < 1e3, allv.max()

    params = fold_batchnorm(raw)
    heat = np.asarray(hrnet_apply(params, cfg, x, compute_dtype=jnp.float32))
    assert np.isfinite(heat).all()
    assert heat.max() - heat.min() > 1e-3  # not a dead constant field
    scales = calibrate(
        lambda b: hrnet_apply(params, cfg, b, compute_dtype=jnp.float32), x
    )
    vals = np.asarray(list(scales.values()))
    assert np.isfinite(vals).all() and (vals < 100.0).all() and (
        vals > 1e-4
    ).all(), (vals.min(), vals.max())


def test_equalize_convs_is_float_exact_and_structural():
    # cross-layer equalization must (a) leave the float model unchanged
    # (ReLU is positively homogeneous), (b) rescale only folded
    # conv1->conv2(->conv3) pairs, (c) feed the int8 path unchanged-or-
    # better. It is default-OFF (no-op on BN-equalized proxies; a knob
    # for real heavy-tailed checkpoints) — see quantize_hrnet docstring.
    from tpupose.models.quantize import calibrate, equalize_convs

    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(3), cfg))
    x = jnp.asarray(
        np.random.default_rng(4).random((2, *cfg.input_size, 3)), jnp.float32
    )
    apply32 = lambda p, b: hrnet_apply(p, cfg, b, compute_dtype=jnp.float32)  # noqa: E731
    ch = calibrate(lambda b: apply32(params, b), x, per_channel=True)
    # per-channel ranges are vectors sized by each conv's input channels
    assert all(getattr(v, "ndim", 0) == 1 for v in ch.values())
    eq = equalize_convs(params, ch, alpha=0.5)

    hf = np.asarray(apply32(params, x))
    he = np.asarray(apply32(eq, x))
    rng_h = hf.max() - hf.min()
    assert np.abs(hf - he).max() / rng_h < 1e-4  # float-exact

    # the block pair really was rescaled (not a silent no-op walk) ...
    w1_orig = np.asarray(params["layer1"]["0"]["conv1"]["weight"])
    w1_eq = np.asarray(eq["layer1"]["0"]["conv1"]["weight"])
    assert not np.allclose(w1_orig, w1_eq)
    # ... and a lone conv (final head, no pair) was not
    np.testing.assert_array_equal(
        np.asarray(params["final_layer"]["weight"]),
        np.asarray(eq["final_layer"]["weight"]),
    )

    # unfolded trees (BN dict non-empty between the pair) must be left alone
    raw = hrnet_init(jax.random.PRNGKey(3), cfg)
    ch_raw = calibrate(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32),
        x,
        per_channel=True,
    )
    eq_raw = equalize_convs(raw, ch_raw)
    np.testing.assert_array_equal(
        np.asarray(raw["layer1"]["0"]["conv1"]["weight"]),
        np.asarray(eq_raw["layer1"]["0"]["conv1"]["weight"]),
    )

    # end-to-end: the equalize=True int8 path stays in the same error band
    qp = quantize_hrnet(params, cfg, x, equalize=True)
    hq = np.asarray(apply32(qp, x))
    assert np.median(np.abs(hf - hq)) / rng_h < 0.02


def test_bias_correction_reduces_systematic_drift():
    # post-quantization bias correction (quantize.bias_correct_convs):
    # absorbs the nonzero MEAN of each quantized conv's error into its
    # bias. Asserts (a) the output-mean drift |E[f32 - int8]| genuinely
    # shrinks, (b) only quantized convs were touched (the skipped head
    # passes through), (c) overall error does not blow up.
    from tpupose.models.quantize import (
        bias_correct_convs,
        calibrate,
        calibrate_bn_stats,
        hrnet_skip_ids,
        record_bias_correction_means,
    )

    cfg = tiny_test_config()
    raw = hrnet_init(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(
        np.random.default_rng(8).random((4, *cfg.input_size, 3)), jnp.float32
    )
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )
    params = fold_batchnorm(raw, dtype=jnp.bfloat16)
    apply_fn = lambda p, b: hrnet_apply(p, cfg, b)  # noqa: E731

    scales = calibrate(lambda b: apply_fn(params, b), x)
    qp = quantize_convs(params, scales, hrnet_skip_ids(params))
    means = record_bias_correction_means(
        lambda b: apply_fn(params, b), x, scales
    )
    # every quantized conv got a mean pair sized by its input channels
    assert all(
        m.shape == mq.shape and m.ndim == 1 for m, mq in means.values()
    )
    qpc = bias_correct_convs(params, qp, means)

    # the skipped final head is untouched; a quantized conv's bias moved
    np.testing.assert_array_equal(
        np.asarray(qp["final_layer"]["weight"]),
        np.asarray(qpc["final_layer"]["weight"]),
    )
    assert not np.allclose(
        np.asarray(qp["layer1"]["0"]["conv1"]["bias"]),
        np.asarray(qpc["layer1"]["0"]["conv1"]["bias"]),
    )

    hf = np.asarray(apply_fn(params, x), np.float32)
    hq = np.asarray(apply_fn(qp, x), np.float32)
    hc = np.asarray(apply_fn(qpc, x), np.float32)
    rng_h = hf.max() - hf.min()
    drift_plain = abs(float(np.mean(hf - hq)))
    drift_corr = abs(float(np.mean(hf - hc)))
    assert drift_corr < drift_plain, (drift_plain, drift_corr)
    # correction must not degrade the overall error band
    assert np.median(np.abs(hf - hc)) / rng_h < 1.5 * np.median(
        np.abs(hf - hq)
    ) / rng_h


def test_skip_lists_are_structural():
    # the float-kept YOLO convs must be EXACTLY the detection heads, for
    # the full-size spec and the tiny test spec alike (guards against the
    # spec list changing under a hard-coded name set)
    from tpupose.models.quantize import (
        hrnet_skip_ids,
        yolo_detection_head_names,
        yolo_skip_ids,
    )
    from tpupose.models.yolov3 import YoloConfig

    for cfg in (YoloConfig(), tiny_yolo_test_config()):
        heads = [
            f"conv{i}"
            for i, (_, _, _, bn) in enumerate(cfg.conv_specs)
            if not bn
        ]
        assert list(yolo_detection_head_names(cfg)) == heads
        assert len(heads) == 3  # three YOLO scales
        params = {
            h: {"conv": {"weight": np.zeros((1, 1, 1, 1))}}
            for h in heads + ["conv0"]
        }
        assert yolo_skip_ids(params, cfg) == {
            id(params[h]["conv"]) for h in heads
        }

    hcfg = tiny_test_config()
    hp = hrnet_init(jax.random.PRNGKey(0), hcfg)
    assert hrnet_skip_ids(hp) == {id(hp["final_layer"])}


def test_int8_resident_block_matches_generic_path():
    # The fused serving block (conv1 epilogue requantizes straight to int8,
    # the inter-conv tensor never materializes in bf16 — docs/PERF.md r3:
    # 1.60x) must agree with the generic quantized composition to within
    # the quantization step: both round the same quantity, the fused path
    # in f32 and the generic path in bf16.
    from tpupose.models.quantize import quantized_basic_block

    rng = np.random.default_rng(21)
    C = 8
    p = {
        "conv1": {
            "weight": jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2,
                                  jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        },
        "conv2": {
            "weight": jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2,
                                  jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        },
    }
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)), jnp.float32)
    mid = jax.nn.relu(conv_apply(p["conv1"], x))
    scales = {
        id(p["conv1"]): float(jnp.max(jnp.abs(x))),
        id(p["conv2"]): float(jnp.max(jnp.abs(mid))),
    }
    q = quantize_convs(p, scales)

    fused = np.asarray(quantized_basic_block(q, x))
    generic = np.asarray(
        jax.nn.relu(
            conv_apply(q["conv2"], jax.nn.relu(conv_apply(q["conv1"], x))) + x
        )
    )
    step = scales[id(p["conv2"])] / 127.0  # one int8 code of the mid tensor
    # a 1-code difference in the mid tensor moves the output by at most
    # step * sum|w2| along any output channel; bound loosely by 3 codes
    w2_l1 = float(np.abs(np.asarray(p["conv2"]["weight"])).sum(axis=(0, 1, 2)).max())
    assert np.max(np.abs(fused - generic)) <= 3 * step * w2_l1, (
        np.max(np.abs(fused - generic)), step, w2_l1
    )
    # and the fused path must still be a REAL basic block: nonneg after relu
    assert (fused >= 0).all()


def test_int8_resident_dispatch_in_hrnet():
    # with cfg.int8_resident=True (opt-in: measured 0.94x whole-model on
    # this chip — docs/PERF.md r3), every basic/bottleneck block must
    # route through the fused path (bn folded, both convs quantized) —
    # guard against a silent fall-back to the generic path.
    import dataclasses

    from tpupose.models import quantize as quant_mod

    cfg = dataclasses.replace(tiny_test_config(), int8_resident=True)
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(8), cfg))
    x = jnp.ones((1, *cfg.input_size, 3), jnp.float32) * 0.5
    qp = quantize_hrnet(params, cfg, x)

    calls = {"basic": 0, "bottleneck": 0}
    orig_basic = quant_mod.quantized_basic_block
    orig_bneck = quant_mod.quantized_bottleneck

    def count_basic(p, v):
        calls["basic"] += 1
        return orig_basic(p, v)

    def count_bneck(p, v):
        calls["bottleneck"] += 1
        return orig_bneck(p, v)

    quant_mod.quantized_basic_block = count_basic
    quant_mod.quantized_bottleneck = count_bneck
    # hrnet imports them inside the function, so patching the module works
    try:
        hrnet_apply(qp, cfg, x)
    finally:
        quant_mod.quantized_basic_block = orig_basic
        quant_mod.quantized_bottleneck = orig_bneck
    n_basic = sum(
        len(mod["branches"][b])
        for s in ("stage2", "stage3", "stage4")
        for mod in qp[s].values()
        for b in mod["branches"]
    )
    assert calls["basic"] == n_basic and n_basic > 0
    assert calls["bottleneck"] == cfg.layer1_blocks


def test_quantized_pytree_is_jittable():
    # quantized params must flow through jit like any other param tree
    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(6), cfg))
    x = jnp.ones((1, *cfg.input_size, 3), jnp.float32)
    qp = quantize_hrnet(params, cfg, x)
    out = jax.jit(lambda b: hrnet_apply(qp, cfg, b))(x)
    assert out.shape == (1, *cfg.heatmap_size, cfg.num_joints)
    assert np.all(np.isfinite(np.asarray(out)))


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    # calibrated int8 trees are serving artifacts: they must survive orbax
    # save/restore bit-exactly (int8 weights, f32 scales, and the skip-listed
    # float convs alike)
    from tpupose.models.checkpoint import restore_params, save_params

    cfg = tiny_test_config()
    params = fold_batchnorm(hrnet_init(jax.random.PRNGKey(7), cfg))
    x = jnp.ones((1, *cfg.input_size, 3), jnp.float32) * 0.5
    qp = quantize_hrnet(params, cfg, x)
    path = str(tmp_path / "qp_ckpt")
    save_params(path, qp)
    restored = restore_params(path, like=qp)
    for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_a = hrnet_apply(qp, cfg, x)
    out_b = hrnet_apply(restored, cfg, x)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_qat_fake_quant_matches_int8_serving_path():
    # The QAT contract: the fake-quant forward (f32 qdq convs, STE) must
    # simulate EXACTLY what requantize_after_qat ships — same weight-scale
    # formula, same activation scales — so the fine-tuned accuracy carries
    # over to the int8 serving tree. Before any training step, the
    # requantized tree must equal quantize_convs' PTQ output bit-for-bit,
    # and the fake-quant forward must track the int8 forward to f32-vs-
    # int32-accumulation rounding.
    from tpupose.models.quantize import (
        fake_quant_convs,
        hrnet_skip_ids,
        requantize_after_qat,
    )

    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, *cfg.input_size, 3)), jnp.float32)
    raw = hrnet_init(jax.random.PRNGKey(8), cfg)
    from tpupose.models.quantize import calibrate_bn_stats

    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )
    params = fold_batchnorm(raw)
    scales = calibrate(lambda b: hrnet_apply(params, cfg, b), x)
    skip = hrnet_skip_ids(params)

    fq = fake_quant_convs(params, scales, skip)
    # the skip-listed head carries no fq leaf
    assert "fq_x_scale" not in fq["final_layer"]
    assert "fq_x_scale" in fq["layer1"]["0"]["conv1"]

    q_ptq = quantize_convs(params, scales, skip)
    q_qat = requantize_after_qat(fq)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(q_ptq),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(q_qat),
               key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(ka))

    heat_fq = np.asarray(
        hrnet_apply(fq, cfg, x, compute_dtype=jnp.float32)
    )
    heat_q = np.asarray(hrnet_apply(q_qat, cfg, x, compute_dtype=jnp.float32))
    rng_h = heat_q.max() - heat_q.min()
    # f32 qdq conv vs int8+int32 accumulation: same grid, tiny roundoff
    assert np.max(np.abs(heat_fq - heat_q)) < 0.02 * rng_h


def test_qat_steps_reduce_fake_quant_loss():
    # a few STE steps on the fake-quant tree must reduce the quantized
    # forward's loss (the whole point of QAT), TRAIN the fq_x_scale
    # leaves (LSQ: the activation scale receives the rounding-residual /
    # clip gradient — see _lsq_qdq), and keep the tree requantizable.
    import optax

    from tpupose.models.quantize import (
        calibrate_bn_stats,
        fake_quant_convs,
        hrnet_skip_ids,
        requantize_after_qat,
    )
    from tpupose.models.train import (
        blob_localization_batch,
        gaussian_target_heatmaps,
        heatmap_loss,
        make_train_step,
    )

    cfg = tiny_test_config()
    rng = np.random.default_rng(5)
    imgs, kps = blob_localization_batch(rng, cfg, 2)
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    raw = hrnet_init(jax.random.PRNGKey(9), cfg)
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), imgs
    )
    params = fold_batchnorm(raw)
    scales = calibrate(lambda b: hrnet_apply(params, cfg, b), imgs)
    fq = fake_quant_convs(params, scales, hrnet_skip_ids(params))
    s_before = float(fq["layer1"]["0"]["conv1"]["fq_x_scale"])

    optimizer = optax.adam(1e-3)
    opt_state = jax.jit(optimizer.init)(fq)
    step = jax.jit(make_train_step(cfg, optimizer, compute_dtype=jnp.float32))
    loss0 = float(
        heatmap_loss(fq, cfg, imgs, targets, weights, jnp.float32)
    )
    for _ in range(8):
        fq, opt_state, loss = step(fq, opt_state, imgs, targets, weights)
    assert float(loss) < loss0, (float(loss), loss0)
    assert float(fq["layer1"]["0"]["conv1"]["fq_x_scale"]) != s_before
    q = requantize_after_qat(fq)
    out = hrnet_apply(q, cfg, imgs)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_distill_qat_beats_ptq_agreement():
    # label-free QAT: fine-tuning the fake-quant tree against the float
    # model's own outputs must yield an int8 tree that tracks the float
    # model more closely than plain PTQ on the same calibration batch.
    from tpupose.models.quantize import (
        calibrate_bn_stats,
        distill_qat,
        hrnet_skip_ids,
        quantize_hrnet,
    )

    cfg = tiny_test_config()
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((2, *cfg.input_size, 3)), jnp.float32)
    raw = hrnet_init(jax.random.PRNGKey(10), cfg)
    calibrate_bn_stats(
        lambda b: hrnet_apply(raw, cfg, b, compute_dtype=jnp.float32), x
    )
    params = fold_batchnorm(raw)

    def apply_fn(p, b):
        return hrnet_apply(p, cfg, b, compute_dtype=jnp.float32)

    ref = np.asarray(apply_fn(params, x))
    q_ptq = quantize_hrnet(params, cfg, x)
    q_qat = distill_qat(apply_fn, params, cfg, [x], steps=40, lr=1e-4,
                        skip_ids=hrnet_skip_ids(params))
    mse_ptq = float(np.mean((np.asarray(apply_fn(q_ptq, x)) - ref) ** 2))
    mse_qat = float(np.mean((np.asarray(apply_fn(q_qat, x)) - ref) ** 2))
    assert mse_qat < mse_ptq, (mse_qat, mse_ptq)
    # the serving tree is a real int8 tree (no fq leaves anywhere)
    assert not any(
        "fq_x_scale" in str(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(q_qat)
    )
