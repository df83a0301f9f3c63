"""int8 accuracy on a LEARNED model (not just random-weight agreement).

Trains the tiny HRNet to localize 17 distinct-colored blobs on a fixed
synthetic batch (adam 1e-3, 2000 steps — the width-8 net learns slowly
but steadily: ~40 px error untrained/at the constant-prediction baseline,
<25 px after training on 96x64 crops), then compares decoded keypoint
error for the bf16 model vs its int8-quantized version. The claim under
test: post-training quantization preserves whatever accuracy the model
actually HAS — the strongest int8 evidence available in an environment
with no pretrained checkpoints or datasets (which is also why a tiny
slow-learning config is used rather than a converged W48).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from tpupose.models.hrnet import hrnet_apply, hrnet_init, tiny_test_config
from tpupose.models.layers import fold_batchnorm
from tpupose.models.quantize import quantize_hrnet
from tpupose.models.train import gaussian_target_heatmaps, make_train_step
from tpupose.ops.heatmap import decode_heatmaps

#: 17 visually distinct RGB colors, one per joint — makes joint identity
#: learnable from color alone.
_JOINT_COLORS = np.array(
    [
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
        [128, 128, 0],
    ],
    np.float32,
)


def _make_batch(rng, cfg, n, blob_sigma=2.5):
    h, w = cfg.input_size
    imgs = np.full((n, h, w, 3), 0.35, np.float32)
    kps = np.zeros((n, cfg.num_joints, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        for j in range(cfg.num_joints):
            x = rng.uniform(6, w - 6)
            y = rng.uniform(6, h - 6)
            kps[i, j] = (x, y, 1.0)
            blob = np.exp(
                -((xx - x) ** 2 + (yy - y) ** 2) / (2 * blob_sigma**2)
            )
            imgs[i] += blob[..., None] * (_JOINT_COLORS[j] / 255.0 - 0.35)
    return jnp.asarray(np.clip(imgs, 0, 1)), jnp.asarray(kps)


def test_int8_preserves_learned_keypoint_accuracy():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, optimizer, compute_dtype=jnp.float32))

    imgs, kps = _make_batch(rng, cfg, 8)
    # x10 target amplification: the raw Gaussian targets are so sparse that
    # the constant-prediction baseline dominates early training
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    targets = targets * 10.0
    for _ in range(2000):
        params, opt_state, loss = step(params, opt_state, imgs, targets, weights)

    folded = fold_batchnorm(params)
    boxes = jnp.tile(
        jnp.asarray([[0.0, 0.0, cfg.input_size[1], cfg.input_size[0]]]), (8, 1)
    )

    def err(p):
        heat = hrnet_apply(p, cfg, imgs, compute_dtype=jnp.float32)
        dec = np.asarray(decode_heatmaps(heat, boxes))
        return float(
            np.mean(
                np.linalg.norm(dec[..., :2] - np.asarray(kps)[..., :2], axis=-1)
            )
        )

    err_bf = err(folded)
    # the model must have genuinely learned localization: the constant-
    # prediction baseline decodes to ~40 px on this batch (measured)
    assert err_bf < 25.0, f"model failed to learn: {err_bf:.2f} px"

    qp = quantize_hrnet(folded, cfg, imgs)
    err_q = err(qp)

    # int8 keeps the learned accuracy (within 2 input px = half a heatmap
    # cell of the bf16 model)
    assert abs(err_q - err_bf) < 2.0, (err_bf, err_q)
    print(f"learned keypoint error: bf16 {err_bf:.2f} px, int8 {err_q:.2f} px")
