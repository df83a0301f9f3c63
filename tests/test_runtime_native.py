"""C++ runtime tests: native LAP vs scipy; threaded JPEG loader round-trip."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tpupose.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


@pytest.mark.parametrize("shape", [(5, 5), (3, 8), (8, 3), (16, 16), (1, 4)])
def test_native_lap_matches_scipy(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    for _ in range(10):
        cost = rng.uniform(-5, 5, size=shape).astype(np.float32)
        col_of_row = native.solve_lap(cost)
        r, c = linear_sum_assignment(cost)
        ref = cost[r, c].sum()
        got_pairs = [(i, j) for i, j in enumerate(col_of_row) if j >= 0]
        assert len(got_pairs) == min(shape)
        got = sum(cost[i, j] for i, j in got_pairs)
        assert abs(got - ref) < 1e-4 * max(1.0, abs(ref))


def _write_jpegs(tmp_path, spec):
    """spec: list over frames of lists of per-view (h, w) or 'corrupt' or
    'missing'. Returns frame_paths."""
    from PIL import Image

    rng = np.random.default_rng(1)
    paths = []
    for t, views in enumerate(spec):
        row = []
        for v, kind in enumerate(views):
            p = tmp_path / f"f{t}_v{v}.jpg"
            if kind == "corrupt":
                p.write_bytes(b"\xff\xd8not a real jpeg payload")
            elif kind == "missing":
                pass  # never created
            else:
                h, w = kind
                img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                Image.fromarray(img).save(p, quality=90)
            row.append(str(p))
        paths.append(row)
    return paths


@pytest.mark.parametrize("bad", ["corrupt", "missing", (32, 48)])
def test_frame_loader_bad_frame_fails_loudly(tmp_path, bad):
    """A corrupt view, a missing view, or a view whose dimensions differ
    from its siblings must raise (naming the frame), never emit garbage
    pixels or deadlock the prefetch threads; good frames before the bad
    one still stream, and close() returns promptly afterwards."""
    ok = (48, 64)
    paths = _write_jpegs(
        tmp_path, [[ok, ok], [ok, bad], [ok, ok]]
    )
    loader = native.FrameLoader(paths, prefetch=3, threads=2)
    first = next(loader)
    assert first.shape == (2, 48, 64, 3)
    with pytest.raises(RuntimeError, match="frame 1"):
        next(loader)
    loader.close()  # must not hang with workers mid-stream


def test_frame_loader_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    originals = []
    for t in range(6):
        views = []
        vimgs = []
        for v in range(2):
            img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            p = tmp_path / f"f{t}_v{v}.jpg"
            Image.fromarray(img).save(p, quality=95)
            views.append(str(p))
            vimgs.append(np.asarray(Image.open(p).convert("RGB")))
        paths.append(views)
        originals.append(np.stack(vimgs))

    loader = native.FrameLoader(paths, prefetch=3, threads=2)
    got = list(loader)
    loader.close()
    assert len(got) == 6
    for t in range(6):
        assert got[t].shape == (2, 48, 64, 3)
        # libjpeg and PIL decode the same file identically
        np.testing.assert_array_equal(got[t], originals[t])
