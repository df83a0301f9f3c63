"""CI-tiny variant of the full-image disk->PCP ingest dress rehearsal
(`scripts/ingest_dress_rehearsal.py`, VERDICT r4 next-round #6).

Drives the identical chain — photo-noise JPEG dataset -> serial decode
baseline -> real eval CLI with the C++ FrameLoader decode-ahead pool ->
PCP table — at reduced frame count on the CPU backend. Timing ratios are
NOT asserted here (this 1-core CI host cannot overlap reliably); the
full-size overlap gate runs on the chip via the script. What IS pinned:
the chain completes, the CLI report carries the decode_wait stage, and
the serial baseline numbers are sane.
"""
import pytest

from tpupose.runtime.native import available


@pytest.mark.skipif(not available(), reason="C++ runtime not built")
def test_pool_overlaps_idle_consumer(tmp_path):
    """The decode-ahead pool's overlap logic, isolated from device/relay
    CPU contention: a consumer that pulls `clip`-frame bursts then idles
    (time.sleep = genuinely free core) must find most frames already
    decoded. Measured on this 1-core host: ~7-10 ms/frame blocked vs
    ~47 ms serial at 5x720p (85% hidden) once prefetch covers the burst
    (prefetch 4 -> 8 was the round-5 fix; at prefetch 4 the buffer
    starves mid-burst and the wait is ~27 ms). The full-size chip gate
    lives in scripts/ingest_dress_rehearsal.py."""
    import os
    import time

    import numpy as np

    from tpupose.data.fabricate import fabricate_mini_dataset
    from tpupose.data.synthetic import make_scene
    from tpupose.runtime.native import FrameLoader

    root = str(tmp_path / "ds")
    frames, clip = 24, 8
    scene = make_scene(num_frames=frames, num_cameras=3, num_actors=2,
                       noise_px=0.0, drop_prob=0.0, seed=3)
    fabricate_mini_dataset(root, scene=scene, photo_noise=20,
                           jpeg_quality=90)
    cam_dirs = sorted(d for d in os.listdir(root) if d.startswith("Camera"))
    fp = [[os.path.join(root, d, f"campus4-c{c}-{t}.jpg")
           for c, d in enumerate(cam_dirs)] for t in range(frames)]

    # serial baseline: drain as fast as possible, 1 worker
    loader = FrameLoader(fp, prefetch=2, threads=1)
    t0 = time.perf_counter()
    for _ in loader:
        pass
    serial = (time.perf_counter() - t0) / frames
    loader.close()

    # burst consumer with idle gaps >= the decode budget per clip
    loader = FrameLoader(fp, prefetch=clip, threads=2)
    it = iter(loader)
    waits = []
    for t in range(frames):
        t0 = time.perf_counter()
        next(it)
        waits.append(time.perf_counter() - t0)
        if (t + 1) % clip == 0:
            time.sleep(max(0.2, serial * clip * 1.2))
    loader.close()
    mean_wait = float(np.mean(waits[clip:]))  # skip first-burst warmup
    assert mean_wait < 0.6 * serial, (
        f"pool failed to decode ahead into idle time: blocked "
        f"{mean_wait * 1e3:.1f} ms/frame vs serial {serial * 1e3:.1f}"
    )


@pytest.mark.skipif(not available(), reason="C++ runtime not built")
def test_ingest_rehearsal_chain_completes(tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from ingest_dress_rehearsal import run

    res = run(frames=12, clip=4, max_wait_frac=None,
              root=str(tmp_path / "ds"), num_cameras=3, verbose=False)
    assert res["frames"] == 12
    assert res["serial_ms_per_frame"] > 0
    assert res["decode_wait_ms_per_frame"] >= 0
    assert res["decode_work_ms_per_frame"] > 0
    assert res["pil_imgs_per_sec"] > 1
    assert 1 in res["native_drain_rates"]
