"""Post-training int8 quantization for the conv backbones (serving mode).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate, and int8
activations halve HBM traffic — measured on this chip (scripts/probe_int8.py,
docs/PERF.md): 1.25-1.5x per HRNet conv shape, more on the wide YOLO
layers. This module implements standard TPU serving quantization:

  * per-output-channel symmetric weight scales (absmax / 127),
  * per-tensor symmetric activation scales from a calibration pass,
  * zero-point 0 everywhere, so TORCH-style zero padding is exact,
  * accumulation in int32, dequantize + bias in float.

The quantized conv dict {"weight_q", "w_scale", "x_scale", "bias"} is
dispatched by `tpupose.models.layers.conv_apply`, so the model apply
functions (`hrnet_apply`, `yolov3_apply`) run quantized without change.
First/last layers (stems, detection/heatmap heads) stay bf16 by default —
standard practice, and the heads' output ranges drive sub-pixel decode.

No counterpart exists in the reference (its backends are f32 CUDA models,
`src/backend/` — SURVEY.md §2.1); this is TPU-build-specific serving
machinery. Accuracy evidence available in this environment: the synthetic
end-to-end PCP stays 100.00 and int8-vs-bf16 keypoints agree to sub-pixel
(tests/test_quantize.py); real-checkpoint calibration needs real data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class QuantizationDriftError(RuntimeError):
    """The quantized model's outputs drifted beyond the accuracy gate on
    the calibration inputs (Pipeline.quantize_models self-check). Plain
    per-tensor PTQ provably breaks learned W48 checkpoints (52.6 px decoded
    error — docs/PERF.md round 3); this error means serving would be
    silently wrong."""


class ActRecorder:
    """Collects per-conv input range statistics during one traced forward.

    `conv_apply` calls `observe(p, x)` when a recorder is active; keys are
    `id(conv_param_dict)`, which is stable as long as the SAME params tree
    object is closed over (not passed as a jit argument, which would
    rebuild the dicts from flattened leaves).
    """

    active = None

    def __init__(self, percentile=None, per_channel=False):
        self.taps = []  # (param_dict_id, traced_range)
        self.percentile = percentile
        self.per_channel = per_channel

    def observe(self, p, x):
        a = jnp.abs(x.astype(jnp.float32))
        if self.per_channel:
            if self.percentile is None:
                v = jnp.max(a, axis=tuple(range(a.ndim - 1)))
            else:
                v = jnp.quantile(
                    a.reshape(-1, a.shape[-1]), self.percentile / 100.0, axis=0
                )
        elif self.percentile is None:
            v = jnp.max(a)
        else:
            v = jnp.quantile(a.ravel(), self.percentile / 100.0)
        self.taps.append((id(p), v))


def calibrate(apply_fn, *batches, percentile=None, per_channel=False):
    """Run `apply_fn(batch)` over calibration batches, recording each
    conv's input range.

    `percentile=None` (default) records absmax. A float selects the
    `percentile`-th percentile of |x| (TensorRT-style clipping
    calibration) — useful for checkpoints with heavy-tailed activations.
    Measured on the BN-normalized HRNet (tests' operating point), whose
    activations are Gaussian-ish with NO heavy tail, clipping only hurts
    (p99 heatmap err: absmax 3.6%, 99.99% 4.0%, 99.9% 5.0%, 99.5% 9.3%),
    so absmax stays the default; the option exists for real-data
    calibration where outlier activations are common.

    Args:
      apply_fn: closure over the params tree mapping a batch -> output
        (e.g. `lambda x: hrnet_apply(params, cfg, x)`). Must close over
        the params, not receive them as arguments.
      *batches: one or more input batches.
      percentile: |x| percentile to map to int8 127 (None = absmax).
      per_channel: record a PER-INPUT-CHANNEL range vector per conv
        instead of a scalar — consumed by `equalize_convs` (the int8
        kernels themselves are per-tensor on activations).

    Returns:
      dict id(conv_param_dict) -> float range (or np vector) over batches.
    """
    out = {}
    for batch in batches:
        rec = ActRecorder(percentile=percentile, per_channel=per_channel)

        def traced(x):
            ActRecorder.active = rec
            try:
                apply_fn(x)
            finally:
                ActRecorder.active = None
            taps = [t for _, t in rec.taps]
            # stacked when scalar: ONE host fetch for all scales (per-value
            # fetches each pay a full relay round-trip)
            return taps if per_channel else jnp.stack(taps)

        vals = jax.jit(traced)(batch)
        if per_channel:
            for (key, _), v in zip(rec.taps, vals):
                out[key] = np.maximum(out.get(key, 0.0), np.asarray(v))
        else:
            vals = np.asarray(vals)
            for (key, _), v in zip(rec.taps, vals):
                out[key] = max(out.get(key, 0.0), float(v))
    return out


#: weight-scale MSE search grid (fractions of per-channel absmax); 1.0 is
#: always included so the search can never be worse than absmax on the
#: quantized-weight MSE it minimizes.
_WEIGHT_MSE_GRID = tuple(np.linspace(0.4, 1.0, 13))


def _quantize_conv(p, absmax, weight_mse=False):
    """Traced per-conv quantization: per-output-channel weight scales,
    per-tensor input scale (a Python float baked in as a constant).

    weight_mse=True replaces the absmax weight scale with a per-channel
    grid search minimizing the weight quantization MSE (clipping a few
    outlier weights buys finer resolution for the bulk)."""
    w = p["weight"].astype(jnp.float32)  # HWIO
    a = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12)  # per cout
    if weight_mse:
        best_s = a / 127.0
        best_err = None
        for k in _WEIGHT_MSE_GRID:
            s = a * (k / 127.0)
            q = jnp.clip(jnp.round(w / s), -127, 127) * s
            err = jnp.sum((w - q) ** 2, axis=(0, 1, 2))
            if best_err is None:
                best_err, best_s = err, s
            else:
                best_s = jnp.where(err < best_err, s, best_s)
                best_err = jnp.minimum(err, best_err)
        w_scale = best_s
    else:
        w_scale = a / 127.0
    weight_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    x_scale = max(float(absmax) / 127.0, 1e-12)
    out = {
        "weight_q": weight_q,
        "w_scale": w_scale,
        "x_scale": jnp.float32(x_scale),
    }
    if "bias" in p:
        out["bias"] = p["bias"].astype(jnp.float32)
    return out


def quantize_convs(params, act_scales, skip_ids=(), weight_mse=False):
    """Replace conv param dicts with quantized dicts.

    The id()-keyed plan is computed on the ORIGINAL tree (Python side),
    then the numeric work runs as ONE jitted program on whatever device
    holds the tree — quantizing a TPU-resident tree must not round-trip
    the host (the axon relay downloads at ~1 MB/s, docs/PERF.md). Inside
    jit the tree is rebuilt from flattened leaves, so id() keys are only
    valid on the original; the plan mirrors the structure instead.

    Args:
      params: BN-FOLDED param tree (quantizing an unfolded conv would bake
        the pre-BN range into the scales; fold first).
      act_scales: dict from `calibrate` (id(conv dict) -> input absmax).
      skip_ids: collection of id(conv dict) to keep in float.

    Returns a new tree; non-conv leaves and skipped convs are unchanged.
    """
    skip = set(skip_ids)

    def plan(node):
        if not isinstance(node, dict):
            return None
        if (
            "weight" in node
            and getattr(node["weight"], "ndim", 0) == 4
            and id(node) in act_scales
            and id(node) not in skip
        ):
            return float(act_scales[id(node)])
        return {k: plan(v) for k, v in node.items()}

    structure_plan = plan(params)

    def walk(node, pl):
        if isinstance(pl, float):
            return _quantize_conv(node, pl, weight_mse=weight_mse)
        if not isinstance(node, dict):
            return node
        return {k: walk(v, pl[k]) for k, v in node.items()}

    return jax.jit(lambda tree: walk(tree, structure_plan))(params)


def _int8_conv(xq, wq, stride=1, padding="TORCH", dilation=1):
    """int8 x int8 -> int32 conv (MXU-native on v5e). Zero-point-0 makes
    the int8 zero padding exactly TORCH's zero padding."""
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if padding == "TORCH":
        kh, kw = wq.shape[0], wq.shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    return jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=s,
        padding=padding,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _quant_input(p, x):
    """Per-tensor symmetric input quantization at the conv's calibrated
    activation scale.

    The scale-and-round runs in f32: rounding a bf16 product adds up to
    ~0.25 int8 steps of extra noise per conv (bf16 ulp near 127 is 0.5)
    on top of the intended 0.5-step quantization. Measured effect at full
    depth (width-8 HRNet, 292 convs): median heatmap err 2.42% -> 2.30%
    — small, because the per-tensor quantization itself dominates — but
    free: the elementwise chain fuses into the conv input, so no extra
    HBM traffic."""
    inv = 1.0 / p["x_scale"]
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )


def quantized_conv_apply(p, x, stride=1, padding="TORCH", dilation=1):
    """int8 conv: quantize input per-tensor, conv in int8 -> int32,
    dequantize per-channel, add bias. Called from `conv_apply`."""
    y = _int8_conv(_quant_input(p, x), p["weight_q"], stride, padding, dilation)
    scale = (p["w_scale"] * p["x_scale"]).astype(jnp.float32)
    out = y.astype(jnp.float32) * scale
    if "bias" in p:
        out = out + p["bias"]
    return out.astype(x.dtype)


def _requant_relu(y32, p_from, p_to):
    """Conv epilogue: int32 accumulators -> relu -> int8 at the NEXT conv's
    calibrated input scale, without materializing a bf16 intermediate.

    The rescale r = w_scale*x_scale/next_x_scale and the bias land the
    value exactly on `relu(dequant(y32)+bias)/next_x_scale` — the same
    quantity the generic path rounds (there in bf16; here in f32, so the
    resident path is slightly MORE accurate). relu == clip-at-0 composes
    with the int8 clip, keeping zero-point 0 (padding stays exact)."""
    r = (p_from["w_scale"] * p_from["x_scale"] / p_to["x_scale"]).astype(
        jnp.float32
    )
    y = y32.astype(jnp.float32) * r
    if "bias" in p_from:
        y = y + p_from["bias"] / p_to["x_scale"]
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def is_quantized_conv(p):
    return isinstance(p, dict) and "weight_q" in p


# -- quantization-aware fine-tuning (QAT) -------------------------------------

def _ste_qdq(t, s):
    """Quantize-dequantize with straight-through gradients (the standard
    QAT estimator: forward sees the int8 grid, backward sees identity)."""
    q = jnp.clip(jnp.round(t / s), -127, 127) * s
    return t + jax.lax.stop_gradient(q - t)


def _lsq_qdq(t, s):
    """Quantize-dequantize with LSQ gradients (Esser et al., "Learned Step
    Size Quantization"): only the ROUND is straight-through; the clip and
    the rescale are left to autodiff, which yields exactly the LSQ
    gradients — d/dt = 1 inside the clip range, 0 outside; d/ds =
    round(t/s) - t/s inside (the rounding residual), ±127 outside (pull
    the range toward/away from the clipped mass). Used for ACTIVATION
    fake-quant so the per-conv scale leaf (`fq_x_scale`) is trainable;
    weights keep plain STE (their scale is re-derived from the live
    weights each step). Forward value is identical to `_ste_qdq`."""
    s = jnp.maximum(s, 1e-12)
    inv = t / s
    r = inv + jax.lax.stop_gradient(jnp.round(inv) - inv)
    return jnp.clip(r, -127, 127) * s


def fake_quant_convs(params, act_scales, skip_ids=()):
    """Fake-quantized (QAT) view of a BN-FOLDED tree.

    Each calibrated conv dict gains an `fq_x_scale` leaf (initialized at
    the calibrated per-tensor input scale and TRAINED with LSQ gradients
    — see `_lsq_qdq`); `conv_apply` then simulates int8 serving with
    straight-through gradients, so the tree can be fine-tuned by the
    ordinary `make_train_step` — the model learns weights AND activation
    ranges that survive the int8 grid. Weight scales are re-derived from
    the live weights each step (per-output-channel absmax,
    gradient-stopped), exactly the formula `quantize_convs` applies
    afterwards, so `requantize_after_qat` reproduces the trained forward
    (up to int32-vs-f32 accumulation rounding).

    Fine-tune with a decay-free optimizer (e.g. `optax.adam`): AdamW's
    weight decay would shrink the `fq_x_scale` leaves toward 0
    independently of their LSQ gradient.
    """
    skip = set(skip_ids)

    def plan(node):
        if not isinstance(node, dict):
            return None
        if (
            _is_conv4(node)
            and id(node) in act_scales
            and id(node) not in skip
        ):
            return max(float(act_scales[id(node)]) / 127.0, 1e-12)
        return {k: plan(v) for k, v in node.items()}

    structure_plan = plan(params)

    def walk(node, pl):
        if isinstance(pl, float):
            out = dict(node)
            out["fq_x_scale"] = jnp.float32(pl)
            return out
        if not isinstance(node, dict):
            return node
        return {k: walk(v, pl[k]) for k, v in node.items()}

    return walk(params, structure_plan)


def fake_quant_conv_apply(p, x, stride=1, padding="TORCH", dilation=1):
    """Forward of a fake-quant conv dict (dispatched by `conv_apply`)."""
    w = p["weight"].astype(jnp.float32)
    ws = jnp.maximum(
        jnp.max(jnp.abs(jax.lax.stop_gradient(w)), axis=(0, 1, 2)) / 127.0,
        1e-12,
    )
    wq = _ste_qdq(w, ws)
    xq = _lsq_qdq(x.astype(jnp.float32), p["fq_x_scale"])
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if padding == "TORCH":
        kh, kw = w.shape[0], w.shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=s, padding=padding, rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def requantize_after_qat(fq_params):
    """Turn a QAT-fine-tuned fake-quant tree into the real int8 serving
    tree: every `fq_x_scale`-carrying conv is quantized at its baked
    activation scale (weight scales from the trained weights — the same
    absmax formula the fake-quant forward used); other nodes pass
    through float."""

    def plan(node):
        if not isinstance(node, dict):
            return None
        if "fq_x_scale" in node:
            return True
        return {k: plan(v) for k, v in node.items()}

    structure_plan = plan(fq_params)

    def walk(node, pl):
        if pl is True:
            clean = {k: v for k, v in node.items() if k != "fq_x_scale"}
            q = _quantize_conv(clean, 0.0)  # absmax placeholder, fixed below
            q["x_scale"] = node["fq_x_scale"]
            return q
        if not isinstance(node, dict):
            return node
        return {k: walk(v, pl[k]) for k, v in node.items()}

    return jax.jit(lambda t: walk(t, structure_plan))(fq_params)


def distill_qat(apply_fn, folded, cfg, batches, steps=200, lr=1e-5,
                skip_ids=None, log=None):
    """LABEL-FREE quantization-aware fine-tuning by self-distillation.

    Serving-time QAT rarely has ground truth; what it always has is the
    float model itself. This fine-tunes the fake-quant tree to match the
    FLOAT model's own outputs on the calibration batches — exactly the
    quantity the int8-vs-bf16 agreement claim measures — with
    straight-through gradients, then requantizes into the int8 serving
    tree. Works on unlabeled frames, so `convert --int8` can apply it with
    nothing but the dataset.

    Args:
      apply_fn: (params, x) -> output (e.g. `lambda p, x: hrnet_apply(
        p, cfg, x, compute_dtype=jnp.float32)`); must take params as an
        ARGUMENT (it is differentiated and re-applied to both trees).
      folded: BN-folded float tree (the teacher AND the student's init).
      cfg: model config (unused here beyond documentation; kept so model
        wrappers share a signature).
      batches: list of calibration input batches (device-resident).
      steps: total optimizer steps (cycling over the batches).
      lr: adam learning rate (small: the student starts at the optimum of
        the unquantized loss; QAT only nudges weights onto the int8 grid).
      skip_ids: convs to keep float (default: none beyond uncalibrated).
      log: optional callable(step, loss) for progress reporting.

    Returns the requantized int8 serving tree.
    """
    import optax

    scales = calibrate(lambda x: apply_fn(folded, x), *batches)
    fq = fake_quant_convs(folded, scales, skip_ids or ())

    def f32_tree(t):
        return jax.tree.map(
            lambda a: jax.lax.stop_gradient(a.astype(jnp.float32)), t
        )

    targets = [f32_tree(apply_fn(folded, b)) for b in batches]

    def loss_fn(p, x, t):
        # outputs may be a single array or a pytree (e.g. YOLO's three
        # raw head maps); mean of per-leaf MSEs
        errs = jax.tree.leaves(
            jax.tree.map(
                lambda a, b: jnp.mean(jnp.square(a.astype(jnp.float32) - b)),
                apply_fn(p, x), t,
            )
        )
        return sum(errs) / len(errs)

    optimizer = optax.adam(lr)  # decay-free: see fake_quant_convs
    opt_state = jax.jit(optimizer.init)(fq)

    @jax.jit
    def step_fn(p, o, x, t):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, t)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    for i in range(steps):
        b = i % len(batches)
        fq, opt_state, loss = step_fn(fq, opt_state, batches[b], targets[b])
        if log is not None and (i + 1) % max(1, steps // 10) == 0:
            log(i + 1, float(loss))
    return requantize_after_qat(fq)


def quantized_basic_block(p, x):
    """int8-RESIDENT HRNet basic block (conv1 -> relu -> conv2 -> +skip -> relu).

    The generic path dequantizes conv1's output to bf16 and conv2
    re-quantizes it — the (N,H,W,C) intermediate makes a round trip
    through HBM at 2 bytes/elt with C padded to 128 lanes. Fusing the
    requantization into conv1's epilogue moves it as int8 instead:
    measured **1.60x** on the branch-1 block at the bench shape
    (scripts/probe_int8_resident.py, docs/PERF.md round 3). The residual
    stays bf16 (accuracy: quantizing the skip would compound across the
    stage depth)."""
    c1, c2 = p["conv1"], p["conv2"]
    yq = _requant_relu(_int8_conv(_quant_input(c1, x), c1["weight_q"]), c1, c2)
    z = _int8_conv(yq, c2["weight_q"]).astype(jnp.float32) * (
        c2["w_scale"] * c2["x_scale"]
    )
    if "bias" in c2:
        z = z + c2["bias"]
    skip = x
    if "downsample" in p:
        from tpupose.models.layers import bn_apply, conv_apply

        skip = bn_apply(p["downsample"]["1"], conv_apply(p["downsample"]["0"], x))
    return jax.nn.relu(z.astype(x.dtype) + skip)


def quantized_bottleneck(p, x):
    """int8-RESIDENT bottleneck (conv1 -> relu -> conv2 -> relu -> conv3):
    both inter-conv tensors stay int8 (same epilogue fusion as
    `quantized_basic_block`)."""
    c1, c2, c3 = p["conv1"], p["conv2"], p["conv3"]
    yq = _requant_relu(_int8_conv(_quant_input(c1, x), c1["weight_q"]), c1, c2)
    zq = _requant_relu(_int8_conv(yq, c2["weight_q"]), c2, c3)
    out = _int8_conv(zq, c3["weight_q"]).astype(jnp.float32) * (
        c3["w_scale"] * c3["x_scale"]
    )
    if "bias" in c3:
        out = out + c3["bias"]
    skip = x
    if "downsample" in p:
        from tpupose.models.layers import bn_apply, conv_apply

        skip = bn_apply(p["downsample"]["1"], conv_apply(p["downsample"]["0"], x))
    return jax.nn.relu(out.astype(x.dtype) + skip)


def _is_conv4(d):
    return isinstance(d, dict) and "weight" in d and getattr(
        d["weight"], "ndim", 0
    ) == 4


def equalize_convs(params, channel_ranges, alpha=0.5):
    """Cross-layer equalization for the per-tensor activation scheme
    (SmoothQuant-style, data-informed).

    The int8 kernels quantize activations PER TENSOR; a tensor whose
    channels have wildly different ranges wastes most of the 8-bit grid
    on its widest channel. For a producer->consumer conv pair separated
    only by a (leaky-)ReLU, scaling producer output channel c by 1/s_c
    and consumer input channel c by s_c is EXACT in float (ReLU is
    positively homogeneous), but reshapes the intermediate activation so
    its channel ranges equalize: s_c = a_c^alpha / max|W2[:,:,c,:]|^(1-alpha)
    with a_c the measured per-channel |activation| range (from
    `calibrate(..., per_channel=True)`). alpha balances activation-range
    flattening (which helps the per-tensor input scale) against consumer
    weight-range growth (which hurts its per-output-channel weight scales
    a little); 0.5 is the SmoothQuant default.

    Applied to the structurally safe pairs in this repo's trees: dict
    nodes holding convK -> convK+1 with the BN between them already
    FOLDED (empty bn dict) — HRNet stem conv1->conv2, every basic block
    conv1->conv2, and bottleneck conv1->conv2->conv3. Fuse/transition
    convs consume multi-producer sums and are left alone.

    Like `quantize_convs`, the id()-keyed plan walks the original tree
    and the numeric work runs as ONE jitted program (no host round-trip
    for device-resident trees).

    Returns a NEW tree, float-equivalent to `params` (up to the tree's
    storage dtype roundoff); quantize AFTER equalizing, calibrating the
    activation scales on the equalized model.
    """

    def plan(node):
        if not isinstance(node, dict):
            return None
        sub = {k: plan(v) for k, v in node.items()}
        pairs = []
        for k1, k2 in (("conv1", "conv2"), ("conv2", "conv3")):
            bn_between = node.get("bn" + k1[4:])
            if (
                _is_conv4(node.get(k1))
                and _is_conv4(node.get(k2))
                and isinstance(bn_between, dict)
                and not bn_between  # folded: ReLU is the only op between
                and id(node[k2]) in channel_ranges
            ):
                pairs.append(
                    (k1, k2, np.asarray(channel_ranges[id(node[k2])],
                                        np.float32))
                )
        return (pairs, sub)

    structure_plan = plan(params)

    def walk(node, pl):
        if pl is None or not isinstance(node, dict):
            return node
        pairs, sub = pl
        node = {k: walk(v, sub[k]) for k, v in node.items()}
        for k1, k2, a in pairs:
            c1, c2 = dict(node[k1]), dict(node[k2])
            w2 = c2["weight"].astype(jnp.float32)
            w2max = jnp.max(jnp.abs(w2), axis=(0, 1, 3))
            a_j = jnp.asarray(a)
            s = jnp.where(
                (a_j > 1e-9) & (w2max > 1e-9),
                (a_j**alpha) / jnp.maximum(w2max, 1e-9) ** (1.0 - alpha),
                1.0,
            )
            c1["weight"] = (
                c1["weight"].astype(jnp.float32) / s
            ).astype(c1["weight"].dtype)
            if "bias" in c1:
                c1["bias"] = (
                    c1["bias"].astype(jnp.float32) / s
                ).astype(c1["bias"].dtype)
            c2["weight"] = (w2 * s[None, None, :, None]).astype(
                c2["weight"].dtype
            )
            node[k1], node[k2] = c1, c2
        return node

    return jax.jit(lambda tree: walk(tree, structure_plan))(params)


class _MSERecorder(ActRecorder):
    """Evaluates, for every conv input, the quantize-dequantize MSE at a
    grid of candidate ranges (fractions of the conv's recorded absmax);
    `calibrate_mse` picks the argmin per conv."""

    def __init__(self, absmax, candidates):
        super().__init__()
        self.absmax = absmax
        self.candidates = candidates

    def observe(self, p, x):
        a = self.absmax.get(id(p))
        if a is None:
            return
        xf = x.astype(jnp.float32)
        errs = []
        for k in self.candidates:
            s = max(float(a) * k / 127.0, 1e-12)
            q = jnp.clip(jnp.round(xf / s), -127, 127) * s
            errs.append(jnp.mean(jnp.square(xf - q)))
        self.taps.append((id(p), jnp.stack(errs)))


#: activation-range MSE search grid (fractions of absmax); includes 1.0
#: so the search can never be worse than absmax on its own objective.
_ACT_MSE_GRID = tuple(np.linspace(0.35, 1.0, 14))


def calibrate_mse(apply_fn, *batches, candidates=_ACT_MSE_GRID):
    """MSE-optimal activation ranges (one absmax pass + one search pass).

    Per-tensor absmax maps int8 127 to the single largest |activation|; a
    rare spike then wastes most of the 8-bit grid on values that never
    occur. Percentile calibration clips blindly; this instead picks, per
    conv, the range r = k*absmax (k over `candidates`) minimizing the
    measured E[(x - qdq(x; r))^2] on the calibration batches — the same
    objective the accumulated int8 noise is made of. Drop-in replacement
    for `calibrate`; feed the result to `quantize_convs`.
    """
    absmax = calibrate(apply_fn, *batches)
    acc = {}
    for batch in batches:
        rec = _MSERecorder(absmax, candidates)

        def traced(x):
            ActRecorder.active = rec
            try:
                apply_fn(x)
            finally:
                ActRecorder.active = None
            return jnp.stack([t for _, t in rec.taps])

        vals = np.asarray(jax.jit(traced)(batch))
        for (key, _), v in zip(rec.taps, vals):
            acc[key] = acc.get(key, 0.0) + v
    return {
        k: float(absmax[k]) * float(candidates[int(np.argmin(v))])
        for k, v in acc.items()
    }


class _MeanRecorder(ActRecorder):
    """Records each conv input's per-channel mean AND the per-channel mean
    of its int8 quantize-dequantize image at the calibrated scale —
    the two first moments `bias_correct_convs` needs. C-vector per conv:
    negligible memory, one traced pass."""

    def __init__(self, act_scales):
        super().__init__()
        self.scales = act_scales

    def observe(self, p, x):
        rng = self.scales.get(id(p))
        if rng is None:
            return
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        s = max(float(rng) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / s), -127, 127) * s
        self.taps.append((id(p), (jnp.mean(xf, axes), jnp.mean(xq, axes))))


def record_bias_correction_means(apply_fn, batch, act_scales):
    """One traced forward collecting (E[x], E[qdq(x)]) per conv input
    channel for every conv in `act_scales` (same closure contract as
    `calibrate`). Feed the result to `bias_correct_convs`."""
    rec = _MeanRecorder(act_scales)

    def traced(x):
        ActRecorder.active = rec
        try:
            apply_fn(x)
        finally:
            ActRecorder.active = None
        return [t for _, t in rec.taps]

    vals = jax.jit(traced)(batch)
    return {
        key: (np.asarray(m), np.asarray(mq))
        for (key, _), (m, mq) in zip(rec.taps, vals)
    }


def bias_correct_convs(params, qparams, means):
    """Post-quantization bias correction (Nagel et al., data-free
    quantization): absorb the SYSTEMATIC output drift of each quantized
    conv into its bias.

    Per-tensor activation + per-channel weight quantization leave a
    nonzero-mean error e(x) = W_f x - W_dq qdq(x); over hundreds of convs
    these means compound through the residual trunk (measured: the W48
    learned-model agreement check fails on argmax jumps without this).
    Using spatial stationarity, E[e] per output channel is

        sum_{kh,kw,cin} W_f[...]  E[x][cin] - W_dq[...] E[qdq(x)][cin]

    with the input means recorded by `record_bias_correction_means` on
    calibration data. Exact for interior pixels; border taps see zero
    padding, where both terms vanish.

    Args:
      params:  the BN-folded float tree (structure + float weights).
      qparams: `quantize_convs(params, ...)` output (same structure).
      means:   dict id(float conv dict) -> (E[x], E[qdq(x)]) per cin.

    Returns a new quantized tree with corrected biases. Skipped (float)
    convs pass through untouched.
    """

    def plan(fnode):
        if not isinstance(fnode, dict):
            return None
        if _is_conv4(fnode):
            return means.get(id(fnode))
        return {k: plan(v) for k, v in fnode.items()}

    structure_plan = plan(params)

    def walk(fnode, qnode, pl):
        if isinstance(pl, tuple):
            if not is_quantized_conv(qnode):
                return qnode  # skipped conv stayed float
            mx, mxq = jnp.asarray(pl[0]), jnp.asarray(pl[1])
            wf = fnode["weight"].astype(jnp.float32)
            wdq = qnode["weight_q"].astype(jnp.float32) * qnode["w_scale"]
            corr = jnp.einsum("hwio,i->o", wf, mx) - jnp.einsum(
                "hwio,i->o", wdq, mxq
            )
            out = dict(qnode)
            out["bias"] = qnode.get("bias", 0.0) + corr
            return out
        if not isinstance(fnode, dict) or pl is None:
            return qnode
        return {k: walk(fnode[k], qnode[k], pl[k]) for k in qnode}

    return jax.jit(lambda f, q: walk(f, q, structure_plan))(params, qparams)


def uncalibrated_scales(params, skip_ids=()):
    """absmax=1 activation scales for every conv — TIMING-ONLY.

    Scale values are irrelevant to execution speed (the quantized program
    is structurally identical), so benchmarks use this to skip the
    calibration forward passes; real serving must `calibrate`."""
    skip = set(skip_ids)
    out = {}

    def walk(node):
        if not isinstance(node, dict):
            return
        if "weight" in node and getattr(node["weight"], "ndim", 0) == 4:
            if id(node) not in skip:
                out[id(node)] = 1.0
            return
        for v in node.values():
            walk(v)

    walk(params)
    return out


def calibrate_bn_stats(apply_fn, batch, iters=1):
    """Re-estimate every BN's running_mean/running_var from data (in place).

    Standard BN re-calibration (AdaBN-style): one forward in TRAIN-mode BN
    (each BN normalizes by the batch statistics of its own input —
    `BNStatRecorder` active switches `bn_apply` to this), recording those
    statistics into the running buffers. Train-mode stats are
    self-consistent in a single pass: every BN's input is already
    normalized by everything upstream exactly as it will be at inference
    with the written-back stats. (Do NOT tap passively and write back in
    parallel — that Jacobi iteration oscillates on deep nets; measured on
    W48: iteration-2 variances reached 1e35 and 87 BNs collapsed to
    constants.)

    Uses: adapting frozen stats to a new domain before folding, and — in
    this repo's tests/benchmarks — giving RANDOM-weight models the O(1)
    per-layer activation statistics a trained+BN network has (an
    unnormalized random residual stack doubles variance per block, which
    no deployed checkpoint resembles).

    Args:
      apply_fn: closure over the UNFOLDED params tree (must close over the
        same dict objects; stats are written into them).
      batch: representative input batch.
      iters: extra passes (train-mode stats are batch-only, so the result
        is idempotent; >1 is never needed and kept only for API compat).
    """
    from tpupose.models.layers import BNStatRecorder

    for _ in range(iters):
        rec = BNStatRecorder()

        def traced(x):
            BNStatRecorder.active = rec
            try:
                apply_fn(x)
            finally:
                BNStatRecorder.active = None
            return [(m, v) for _, m, v in rec.taps]

        vals = jax.jit(traced)(batch)
        for (p, _, _), (m, v) in zip(rec.taps, vals):
            p["running_mean"] = jnp.asarray(np.asarray(m), jnp.float32)
            p["running_var"] = jnp.asarray(np.asarray(v), jnp.float32)


# -- model-level convenience --------------------------------------------------

def hrnet_skip_ids(params):
    """Conv dicts to keep in float for HRNet: the final heatmap head (its
    output drives sub-pixel argmax refinement). Stems quantize fine: the
    network input is uint8/255, so 8-bit input quantization is essentially
    exact, and the stem outputs are the largest padded-layout tensors in
    the net (docs/PERF.md)."""
    return {id(params["final_layer"])}


def yolo_detection_head_names(cfg):
    """Names of the detection-head convs, selected STRUCTURALLY: the heads
    are exactly the bias-carrying convs of the darknet spec (bn=False —
    `_conv_specs` marks only the three detection outputs that way), so the
    set tracks any spec change instead of hard-coding indices."""
    return tuple(
        f"conv{i}" for i, (_, _, _, bn) in enumerate(cfg.conv_specs) if not bn
    )


def yolo_skip_ids(params, cfg):
    """Conv dicts to keep in float for YOLOv3: the detection heads (box
    regression consumes their raw values). conv0 quantizes fine — its
    input is uint8/255 — and its 416x416x32 output is the most
    padding-inflated tensor in the whole pipeline (32 -> 128 lanes)."""
    return {id(params[h]["conv"]) for h in yolo_detection_head_names(cfg)}


def quantize_hrnet(params, cfg, sample_batch, equalize=False, alpha=0.5):
    """Calibrate + quantize a BN-folded HRNet param tree.

    `equalize` first applies data-informed cross-layer equalization
    (`equalize_convs`) — float-exact — then calibrates the activation
    scales on the equalized model. Default OFF: on the BN-recalibrated
    random-weight proxy available here the channel ranges are already
    near-equal (AdaBN normalizes them), so it measures as a no-op
    (median heatmap err 2.29% -> 2.35/2.24/2.29% at alpha
    0.5/0.75/1.0, full-depth width-8, 2026-08-17). It exists for REAL
    checkpoints, whose post-ReLU channel ranges are heavy-tailed — the
    regime cross-layer equalization was designed for."""
    from tpupose.models.hrnet import hrnet_apply

    if equalize:
        ch = calibrate(
            lambda x: hrnet_apply(params, cfg, x), sample_batch,
            per_channel=True,
        )
        params = equalize_convs(params, ch, alpha)
    scales = calibrate(lambda x: hrnet_apply(params, cfg, x), sample_batch)
    return quantize_convs(params, scales, hrnet_skip_ids(params))


def quantize_yolo(params, cfg, sample_batch):
    """Calibrate + quantize a BN-folded YOLOv3 param tree."""
    from tpupose.models.yolov3 import yolov3_apply

    scales = calibrate(lambda x: yolov3_apply(params, cfg, x), sample_batch)
    return quantize_convs(params, scales, yolo_skip_ids(params, cfg))
