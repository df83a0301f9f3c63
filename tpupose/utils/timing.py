"""Stage timing helpers (device-aware).

Mirrors the reference's per-stage s/frame + fps report
(`src/testmodel.py:92-99`) but with `jax.block_until_ready` so device work is
actually measured, plus an optional jax.profiler trace context.
"""
from __future__ import annotations

import contextlib
import time

import jax


class StageTimer:
    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, stage: str, block_on=None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[stage] = self.totals.get(stage, 0.0) + time.perf_counter() - start
        self.counts[stage] = self.counts.get(stage, 0) + 1

    def add(self, stage: str, seconds: float, count: int = 1):
        self.totals[stage] = self.totals.get(stage, 0.0) + seconds
        self.counts[stage] = self.counts.get(stage, 0) + count

    def per_frame(self, stage: str):
        c = self.counts.get(stage, 0)
        return self.totals.get(stage, 0.0) / c if c else 0.0

    def report(self, num_views: int = 1):
        """Reference-format report (`src/testmodel.py:92-99`)."""
        det = self.per_frame("person_detect")
        pose = self.per_frame("pose_detect")
        track = self.per_frame("track")
        lines = [
            f"Person Detect Processing time (s/f): {det:f}",
            f"Pose Detect Processing time (s/f): {pose:f}",
            f"Track Processing time (s/f): {track:f}",
        ]
        denom = (det + pose) / max(num_views, 1) + track
        if denom > 0:
            lines.append(f"fps: {1.0 / denom:f}")
        if track > 0:
            lines.append(f"tracking fps: {1.0 / track:f}")
        if "decode_work" in self.totals:
            # Decode-ahead workers' actual per-frame decode wall time
            # (C++ side). Compare with a quiet-host serial decode: a
            # large ratio means the host core(s) were contended during
            # the run, so any decode_wait above reflects CPU famine
            # rather than missing overlap.
            lines.append(
                f"Decode work (s/f): {self.per_frame('decode_work'):f}"
            )
        if "decode_wait" in self.totals:
            # Host-thread stall waiting for the next decoded frame (the
            # decode-ahead pool's overlap signature — ~0 when the C++
            # FrameLoader workers stay ahead of device dispatch; the full
            # serial decode cost on the PIL fallback). Not part of the
            # reference report format (its decode is unmeasured, inside
            # the timed loop — src/dataset.py:36-45).
            lines.append(
                f"Decode wait (s/f): {self.per_frame('decode_wait'):f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """Optional XLA profiler trace (view with TensorBoard)."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
