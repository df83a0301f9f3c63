"""Numeric converter/semantic parity evidence vs torch.

Two layers of evidence (SURVEY.md §7 hard part 6 — stride-2 padding, BN eps,
nearest upsample and leaky slope each silently shift accuracy if wrong):

1. Torch-free GOLDEN fixtures: tiny hard-coded inputs with expected outputs
   computed once from torch 2.x CPU (generation commands in each test's
   docstring) — these run everywhere and pin the exact semantics.
2. Live torch cross-checks (skipped where torch is absent): random-tensor
   layer-by-layer parity on the primitives plus a converted conv+bn block,
   and a darknet .weights round-trip through real torch-ordered buffers.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpupose.models.layers import (
    bn_apply,
    conv_apply,
    fold_batchnorm,
    leaky_relu,
    upsample_nearest,
)


# -- golden fixtures (torch-free) ---------------------------------------------

def test_golden_conv_stride2_torch_padding():
    """nn.Conv2d(1, 2, 3, stride=2, padding=1, bias=False) on
    x = arange(25)/10, w = (arange(18)-9)/10 (OIHW)."""
    x = (np.arange(25, dtype=np.float32).reshape(1, 5, 5, 1)) / 10.0  # NHWC
    w = ((np.arange(18, dtype=np.float32).reshape(2, 1, 3, 3)) - 9.0) / 10.0
    p = {"weight": jnp.asarray(w.transpose(2, 3, 1, 0))}  # OIHW -> HWIO
    y = np.asarray(conv_apply(p, jnp.asarray(x), stride=2))
    expect = np.array(
        [
            [[-0.2, -0.68, -0.8],
             [-2.22, -4.44, -3.8400002],
             [-4.16, -7.34, -5.7200003]],
            [[0.88000005, 1.75, 1.36],
             [3.45, 5.28, 3.4499998],
             [2.32, 3.19, 1.84]],
        ],
        np.float32,
    )  # torch output, OHW for the 2 channels
    np.testing.assert_allclose(
        y[0].transpose(2, 0, 1), expect, rtol=1e-6, atol=1e-6
    )


def test_golden_bn_eps():
    """nn.BatchNorm2d(3, eps=1e-5).eval() with gamma=[1.5,.5,2], beta=
    [.1,-.2,.3], mean=[.2,-.1,1], var=[.25,4,.01] on x=[-1,.5,2]."""
    p = {
        "weight": jnp.array([1.5, 0.5, 2.0]),
        "bias": jnp.array([0.1, -0.2, 0.3]),
        "running_mean": jnp.array([0.2, -0.1, 1.0]),
        "running_var": jnp.array([0.25, 4.0, 0.01]),
    }
    x = jnp.array([-1.0, 0.5, 2.0]).reshape(1, 1, 1, 3)
    y = np.asarray(bn_apply(p, x)).reshape(3)
    np.testing.assert_allclose(
        y, [-3.499928, -0.05000018, 20.290007], rtol=1e-5, atol=1e-5
    )


def test_golden_upsample_nearest():
    """nn.Upsample(scale_factor=2, mode='nearest') on [[1,2],[3,4]]."""
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = np.asarray(upsample_nearest(x, 2)).reshape(4, 4)
    np.testing.assert_array_equal(
        y, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]
    )


def test_golden_leaky_slope():
    """F.leaky_relu(x, 0.1) on [-2, -0.5, 0, 1.5] — darknet's slope."""
    y = np.asarray(leaky_relu(jnp.array([-2.0, -0.5, 0.0, 1.5])))
    np.testing.assert_allclose(y, [-0.2, -0.05, 0.0, 1.5], atol=1e-7)


# -- live torch cross-checks ---------------------------------------------------

torch = pytest.importorskip("torch")


def _to_nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1), (1, 2)])
def test_torch_conv_parity_random(k, stride):
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(5, 7, k, stride=stride, padding=k // 2, bias=True)
    x = torch.randn(2, 5, 9, 11)
    y_t = _to_nhwc(conv(x))
    p = {
        "weight": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    y_j = np.asarray(conv_apply(p, jnp.asarray(_to_nhwc(x)), stride=stride))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)


def test_torch_bn_parity_random():
    torch.manual_seed(2)
    bn = torch.nn.BatchNorm2d(6, eps=1e-5).eval()
    bn.running_mean = torch.randn(6)
    bn.running_var = torch.rand(6) + 0.1
    bn.weight.data = torch.randn(6)
    bn.bias.data = torch.randn(6)
    x = torch.randn(2, 6, 4, 4)
    y_t = _to_nhwc(bn(x))
    p = {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "running_mean": jnp.asarray(bn.running_mean.numpy()),
        "running_var": jnp.asarray(bn.running_var.numpy()),
    }
    y_j = np.asarray(bn_apply(p, jnp.asarray(_to_nhwc(x))))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)


def test_torch_conv_bn_block_and_fold_parity():
    """A converted conv->bn block matches torch eval, with and without BN
    folding (folding must be exactness-preserving for frozen stats)."""
    torch.manual_seed(3)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8).eval()
    bn.running_mean = torch.randn(8)
    bn.running_var = torch.rand(8) + 0.2
    bn.weight.data = torch.randn(8)
    bn.bias.data = torch.randn(8)
    x = torch.randn(1, 3, 12, 16)
    y_t = _to_nhwc(bn(conv(x)))

    from tpupose.models.convert import torch_state_dict_to_tree

    sd = {
        "block.conv.weight": conv.weight,
        "block.bn.weight": bn.weight,
        "block.bn.bias": bn.bias,
        "block.bn.running_mean": bn.running_mean,
        "block.bn.running_var": bn.running_var,
        "block.bn.num_batches_tracked": torch.tensor(0),
    }
    tree = torch_state_dict_to_tree(sd)["block"]
    xj = jnp.asarray(_to_nhwc(x))
    y_j = np.asarray(bn_apply(tree["bn"], conv_apply(tree["conv"], xj, stride=2)))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)

    folded = fold_batchnorm({"block": tree})["block"]
    y_f = np.asarray(
        bn_apply(folded["bn"], conv_apply(folded["conv"], xj, stride=2))
    )
    np.testing.assert_allclose(y_f, y_t, rtol=1e-4, atol=1e-4)


def test_torch_hrnet_basic_block_parity():
    """One full HRNet BasicBlock (conv-bn-relu-conv-bn + skip, relu) vs a
    torch replica, weights moved through the converter."""
    torch.manual_seed(4)

    class BasicBlock(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(c)
            self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(c)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + x)

    blk = BasicBlock(4).eval()
    for bn in (blk.bn1, blk.bn2):
        bn.running_mean = torch.randn(4) * 0.1
        bn.running_var = torch.rand(4) + 0.5
    x = torch.randn(2, 4, 8, 8)
    y_t = _to_nhwc(blk(x))

    from tpupose.models.convert import torch_state_dict_to_tree
    from tpupose.models.hrnet import _basic_block

    tree = torch_state_dict_to_tree(dict(blk.state_dict()))
    y_j = np.asarray(_basic_block(tree, jnp.asarray(_to_nhwc(x))))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)


# -- darknet header variants -----------------------------------------------------

def _tiny_yolo_payload():
    from tpupose.models.yolov3 import conv_in_channels, tiny_yolo_test_config

    cfg = tiny_yolo_test_config()
    cins = conv_in_channels(cfg)
    rng = np.random.default_rng(0)
    chunks = []
    for (cout, k, s, bn), cin in zip(cfg.conv_specs, cins):
        if bn:
            chunks.append(rng.normal(size=4 * cout))
        else:
            chunks.append(rng.normal(size=cout))
        chunks.append(rng.normal(size=cout * cin * k * k))
    return cfg, np.concatenate(chunks).astype(np.float32)


@pytest.mark.parametrize(
    "major,minor,seen_dtype", [(0, 2, np.int64), (0, 1, np.int32)]
)
def test_darknet_header_variants(tmp_path, major, minor, seen_dtype):
    """`seen` is int64 only for version >= 0.2; an old-format file parsed as
    5x int32 would shift every weight by 4 bytes."""
    from tpupose.models.convert import (
        load_darknet_weights,
        read_darknet_file,
        write_darknet_file,
    )

    cfg, payload = _tiny_yolo_payload()
    path = tmp_path / "w.weights"
    write_darknet_file(
        str(path), {"major": major, "minor": minor, "revision": 0, "seen": 12345},
        payload,
    )
    header, data = read_darknet_file(str(path))
    assert header["major"] == major and header["seen"] == 12345
    np.testing.assert_array_equal(data, payload)
    params, header2 = load_darknet_weights(str(path), cfg)
    assert header2["seen"] == 12345
    # First conv weights land where the payload put them (no byte shift).
    first_cout = cfg.conv_specs[0][0]
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["bn"]["bias"]), payload[:first_cout],
        rtol=1e-6,
    )


def test_darknet_torch_order_cross_check(tmp_path):
    """Round-trip: serialize a torch conv+bn in darknet order, load through
    the converter, and match torch's eval output."""
    from tpupose.models.convert import darknet_array_to_params
    from tpupose.models.yolov3 import tiny_yolo_test_config, conv_in_channels

    cfg, payload = _tiny_yolo_payload()
    params = darknet_array_to_params(payload, cfg)
    # Rebuild torch modules for conv0 from the same payload and compare.
    cins = conv_in_channels(cfg)
    cout, k, s, bn = cfg.conv_specs[0]
    cin = cins[0]
    off = 0
    bn_bias = payload[off:off + cout]; off += cout
    bn_scale = payload[off:off + cout]; off += cout
    bn_mean = payload[off:off + cout]; off += cout
    bn_var = payload[off:off + cout]; off += cout
    w = payload[off:off + cout * cin * k * k].reshape(cout, cin, k, k)

    tconv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=k // 2, bias=False)
    tconv.weight.data = torch.from_numpy(w.copy())
    tbn = torch.nn.BatchNorm2d(cout, eps=1e-5).eval()
    tbn.weight.data = torch.from_numpy(bn_scale.copy())
    tbn.bias.data = torch.from_numpy(bn_bias.copy())
    tbn.running_mean = torch.from_numpy(bn_mean.copy())
    tbn.running_var = torch.from_numpy(np.abs(bn_var.copy()) + 0.1)

    x = torch.randn(1, cin, 8, 8)
    y_t = _to_nhwc(tbn(tconv(x)))
    p = dict(params["conv0"])
    p = {"conv": p["conv"], "bn": dict(p["bn"])}
    p["bn"]["running_var"] = jnp.abs(p["bn"]["running_var"]) + 0.1
    y_j = np.asarray(
        bn_apply(p["bn"], conv_apply(p["conv"], jnp.asarray(_to_nhwc(x)), stride=s))
    )
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)
