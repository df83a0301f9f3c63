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
    assert res["pil_imgs_per_sec"] > 1
    assert 1 in res["native_drain_rates"]
