"""Worker process for the 2-process multi-host cluster test.

Not a test module — launched by tests/test_multihost.py as
`python tests/multihost_worker.py <process_id> <num_processes> <port>`.
Each process owns 4 virtual CPU devices; the global mesh spans 8.
"""
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import numpy as np
    import jax.numpy as jnp

    from tpupose.data.synthetic import make_scene
    from tpupose.geometry import make_camera_set
    from tpupose.parallel import multihost
    from tpupose.parallel.streams import multistream_step
    from tpupose.tracking.tracker import TrackerConfig, init_state

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    mesh = multihost.global_mesh()
    S = 4 * nproc  # one stream per global device
    start, end = multihost.process_stream_slice(S)
    local = end - start

    scene = make_scene(num_frames=1, num_cameras=3, num_actors=2, seed=0)
    rig = make_camera_set(scene.P, scene.K, scene.RT, scene.width, scene.height)
    tcfg = TrackerConfig(num_cameras=3, max_tracks=8, max_dets=4, max_hyp=12)

    def tile_local(tree):
        return jax.tree.map(
            lambda x: np.broadcast_to(
                np.asarray(x)[None], (local,) + np.asarray(x).shape
            ),
            tree,
        )

    dets = np.zeros((local, 3, 4, 17, 3), np.float32)
    mask = np.zeros((local, 3, 4), bool)
    for c, d in enumerate(scene.detections_list(0)):
        dets[:, c, : len(d)] = d
        mask[:, c, : len(d)] = True

    cams_g = multihost.global_streams(mesh, tile_local(rig))
    state_g = multihost.global_streams(mesh, tile_local(init_state(tcfg)))
    dets_g = multihost.global_streams(mesh, dets)
    mask_g = multihost.global_streams(mesh, mask)
    fids_g = multihost.global_streams(
        mesh, np.zeros((local,), np.int32)
    )

    step = jax.jit(partial(multistream_step, tcfg))
    new_state, out = step(cams_g, state_g, dets_g, mask_g, fids_g)

    # hot loop kept stream-local: the output stays sharded over 'data'
    assert new_state.active.sharding.spec[0] == "data", new_state.active.sharding

    metric = multihost.all_hosts_metric(
        mesh, lambda active: jnp.sum(active.astype(jnp.int32))
    )
    total = int(metric(new_state.active))
    # every host must report the same global count (psum over ICI+DCN)
    print(f"RESULT pid={pid} total={total}", flush=True)


if __name__ == "__main__":
    main()
