"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.data.synthetic import make_scene
from tpupose.geometry import make_camera_set
from tpupose.parallel import (
    broadcast_cameras,
    conv_param_sharding,
    data_sharding,
    init_multistream_state,
    make_mesh,
    make_multistream_step_fn,
    shard_streams,
)
from tpupose.tracking.tracker import TrackerConfig, init_state, make_step_fn


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_dryrun_multichip_entrypoints():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles_tiny_equivalent():
    # entry() builds W48 (too slow for CPU CI); check the same code path with
    # the tiny config instead.
    from tpupose.models.hrnet import hrnet_apply, hrnet_init, tiny_test_config

    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.input_size[0], cfg.input_size[1], 3), jnp.bfloat16)
    fn = jax.jit(lambda p, x: hrnet_apply(p, cfg, x))
    out = fn(params, x)
    assert out.shape[0] == 2


def test_multistream_matches_single_stream():
    scene = make_scene(num_frames=6, num_cameras=4, num_actors=2, noise_px=0.8,
                       seed=11)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=4, max_tracks=8, max_dets=6, max_hyp=16)
    mesh = make_mesh(data=8, model=1)
    S = 8

    step1 = make_step_fn(tcfg)
    state1 = init_state(tcfg)

    cams = shard_streams(mesh, broadcast_cameras(rig, S))
    stateS = shard_streams(mesh, init_multistream_state(tcfg, S))
    stepS = make_multistream_step_fn(tcfg, mesh)

    for t in range(scene.num_frames):
        dets = np.zeros((4, 6, 17, 3), np.float32)
        mask = np.zeros((4, 6), bool)
        for c, d in enumerate(scene.detections_list(t)):
            dets[c, : len(d)] = d
            mask[c, : len(d)] = True
        state1, out1 = step1(rig, state1, jnp.asarray(dets), jnp.asarray(mask), t)
        detsS = shard_streams(mesh, jnp.broadcast_to(jnp.asarray(dets), (S,) + dets.shape))
        maskS = shard_streams(mesh, jnp.broadcast_to(jnp.asarray(mask), (S,) + mask.shape))
        fidS = shard_streams(mesh, jnp.full(S, t, jnp.int32))
        stateS, outS = stepS(cams, stateS, detsS, maskS, fidS)

    # Every stream's final state equals the single-stream run.
    for s in range(S):
        np.testing.assert_array_equal(
            np.asarray(stateS.track_id[s]), np.asarray(state1.track_id)
        )
        np.testing.assert_allclose(
            np.asarray(stateS.hist_pose[s]), np.asarray(state1.hist_pose),
            atol=1e-5,
        )


def test_conv_param_sharding_rules():
    from tpupose.models.hrnet import hrnet_init, tiny_test_config

    mesh = make_mesh(data=4, model=2)
    params = hrnet_init(jax.random.PRNGKey(0), tiny_test_config())
    shardings = conv_param_sharding(mesh, params)
    flat_p = jax.tree.leaves_with_path(params)
    flat_s = dict(jax.tree.leaves_with_path(shardings))
    n_tp = 0
    for path, leaf in flat_p:
        s = flat_s[tuple(path)] if isinstance(flat_s, dict) else None
    # simpler: count sharded leaves
    n_tp = sum(
        1
        for s in jax.tree.leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        if any(a is not None for a in s.spec)
    )
    assert n_tp > 10  # a meaningful number of kernels are TP-sharded


def test_multistream_step_fn_honors_mesh_shardings():
    """With a mesh, the jitted multistream step pins stream-axis 'data'
    sharding on inputs AND outputs (no silent replication)."""
    scene = make_scene(num_frames=1, num_cameras=3, num_actors=2, seed=5)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=3, max_tracks=8, max_dets=4, max_hyp=12)
    mesh = make_mesh(data=8, model=1)
    S = 8
    cams = shard_streams(mesh, broadcast_cameras(rig, S))
    state = shard_streams(mesh, init_multistream_state(tcfg, S))
    dets = np.zeros((S, 3, 4, 17, 3), np.float32)
    mask = np.zeros((S, 3, 4), bool)
    for c, d in enumerate(scene.detections_list(0)):
        dets[:, c, : len(d)] = d
        mask[:, c, : len(d)] = True
    step = make_multistream_step_fn(tcfg, mesh)
    new_state, out = step(
        cams, state, shard_streams(mesh, jnp.asarray(dets)),
        shard_streams(mesh, jnp.asarray(mask)),
        shard_streams(mesh, jnp.zeros(S, jnp.int32)),
    )
    for leaf in jax.tree.leaves(new_state) + jax.tree.leaves(out):
        spec = leaf.sharding.spec
        assert len(spec) >= 1 and spec[0] == "data", f"bad sharding {spec}"
    assert bool(jnp.any(new_state.active))


def test_sharded_train_step_runs_and_keeps_shardings():
    from tpupose.models.hrnet import hrnet_init, tiny_test_config
    from tpupose.models.train import (
        gaussian_target_heatmaps,
        make_optimizer,
        make_sharded_train_step,
    )

    mesh = make_mesh(data=4, model=2)
    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(lr=1e-4)
    step, shardings_for = make_sharded_train_step(
        cfg, optimizer, mesh, compute_dtype=jnp.float32
    )
    params = jax.device_put(params, shardings_for(params))
    opt_state = optimizer.init(params)
    batch = 8
    images = jnp.zeros((batch, cfg.input_size[0], cfg.input_size[1], 3))
    kps = jnp.tile(jnp.array([[8.0, 9.0, 1.0]]), (batch, cfg.num_joints, 1))
    targets, weights = gaussian_target_heatmaps(cfg, kps)
    params2, opt_state2, loss = step(params, opt_state, images, targets, weights)
    assert np.isfinite(float(loss))
    # TP-sharded kernels stay TP-sharded after the update.
    specs = [
        s.spec
        for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, params2),
            is_leaf=lambda x: hasattr(x, "spec"),
        )
    ]
    assert any("model" in tuple(sp) for sp in specs)
    # Second call reuses the cached compiled fn.
    params3, _, loss2 = step(params2, opt_state2, images, targets, weights)
    assert np.isfinite(float(loss2))


def test_sharded_train_bn_matches_unsharded():
    """Sharded train-mode BN is synchronized BN: batch statistics reduce
    over the FULL data-sharded batch (GSPMD turns the global mean/var
    into cross-shard psums), so the sharded loss equals the single-device
    loss on the same inputs."""
    from tpupose.models.hrnet import hrnet_init, tiny_test_config
    from tpupose.models.train import (
        blob_localization_batch,
        gaussian_target_heatmaps,
        heatmap_loss,
        make_optimizer,
        make_sharded_train_step,
    )

    mesh = make_mesh(data=4, model=2)
    cfg = tiny_test_config()
    params = hrnet_init(jax.random.PRNGKey(2), cfg)
    imgs, kps = blob_localization_batch(np.random.default_rng(3), cfg, 8)
    targets, weights = gaussian_target_heatmaps(cfg, kps)

    loss_ref = float(
        heatmap_loss(params, cfg, imgs, targets, weights, jnp.float32, True)
    )

    optimizer = make_optimizer(lr=1e-4)
    step, shardings_for = make_sharded_train_step(
        cfg, optimizer, mesh, compute_dtype=jnp.float32, train_bn=True
    )
    sharded_params = jax.device_put(params, shardings_for(params))
    opt_state = optimizer.init(sharded_params)
    _, _, loss = step(sharded_params, opt_state, imgs, targets, weights)
    assert abs(float(loss) - loss_ref) <= 1e-5 * max(1.0, abs(loss_ref))
