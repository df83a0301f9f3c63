"""CPU smoke of the REAL pose_hrnet_w48 topology.

The tiny test config uses a (1, 1, 1) module schedule, which never exercises
the multi-module stage paths (stage3's 4 modules, stage4's 3 with the final
single-branch fuse) that the real checkpoint converter must land on. This
test builds width-48 with the real (1, 4, 3) schedule and runs one forward
at a reduced input size — the topology (module/branch/fuse structure) is
input-size independent, so this covers exactly the paths the 384x288
flagship uses."""
import numpy as np
import jax
import jax.numpy as jnp

from tpupose.models.hrnet import HRNetConfig, hrnet_apply, hrnet_init


def test_w48_real_schedule_forward():
    cfg = HRNetConfig(width=48, input_size=(96, 64))
    assert cfg.stage_modules == (1, 4, 3)
    assert cfg.stage_blocks == 4 and cfg.layer1_blocks == 4
    params = hrnet_init(jax.random.PRNGKey(0), cfg)

    # Real param-tree shape: 4 stage3 modules, 3 stage4 modules, the last
    # stage4 module fusing to the single high-res branch only.
    assert sorted(params["stage3"].keys()) == ["0", "1", "2", "3"]
    assert sorted(params["stage4"].keys()) == ["0", "1", "2"]
    assert sorted(params["stage4"]["0"]["fuse_layers"].keys()) == ["0", "1", "2", "3"]
    assert sorted(params["stage4"]["2"]["fuse_layers"].keys()) == ["0"]
    # W48 parameter count matches the official pose_hrnet_w48 (~63.6M).
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 60e6 < n_params < 68e6, n_params

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 96, 64, 3)), jnp.float32
    )
    heat = hrnet_apply(params, cfg, x, compute_dtype=jnp.float32)
    assert heat.shape == (1, 24, 16, 17)
    assert bool(jnp.all(jnp.isfinite(heat)))
    # The multi-module path must actually mix information across branches:
    # different joints' heatmaps should not be identical.
    h = np.asarray(heat[0])
    assert np.std(h) > 0
    assert not np.allclose(h[..., 0], h[..., 1])
