"""Multi-host (DCN) path: a REAL 2-process jax.distributed cluster on the
CPU backend (4 virtual devices per process, 8 global), running the
stream-parallel tracker step over a global mesh with per-host input
feeding and a cross-host psum metric.

The reference has no distributed code at all (SURVEY.md §2.4); this
validates the TPU-build's multi-host story end-to-end: cluster formation,
global mesh spanning processes, `make_array_from_process_local_data`
feeding, hot-loop stream locality, and the DCN-crossing metric reduction.
"""
import os
import socket
import subprocess
import sys




def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_streams_and_psum():
    # hang protection comes from the communicate(timeout=540) below
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{out}"
        results.append(lines[-1].split("total=")[1])

    # the psum'd global metric must agree across hosts and be nonzero
    assert results[0] == results[1], results
    assert int(results[0]) > 0, results
