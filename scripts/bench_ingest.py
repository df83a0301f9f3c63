"""Host ingest benchmark CLI (VERDICT r3 missing #4).

    python scripts/bench_ingest.py [--frames 64] [--views 5] [--no-device]

Measures the C++ FrameLoader's JPEG-decode throughput (the host budget for
feeding 75.6 fps x 5 views of 720p = 378 decodes/sec, W32: 868/sec) and the
overlapped disk->device deliverable fps on this host/device link. See
tpupose/runtime/ingest_bench.py for methodology; results recorded in
docs/PERF.md.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpupose.runtime.ingest_bench import report  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--threads", type=str, default="1,2,4,8")
    ap.add_argument("--no-device", action="store_true",
                    help="skip the disk->device leg (decode-only)")
    args = ap.parse_args()
    report(
        num_frames=args.frames, num_views=args.views, width=args.width,
        height=args.height,
        threads_list=tuple(int(t) for t in args.threads.split(",")),
        device=not args.no_device, file=sys.stdout,
    )


if __name__ == "__main__":
    main()
