"""2-process `jax.distributed` smoke test (SURVEY.md §4, §5 DCN analogue).

Spawns two coordinated CPU processes, each owning one device, forming a
cross-process 1x2 mesh; `dist.sharded_local_ba` must match the
single-device `backend.ba.local_ba` result (asserted inside process 0,
`tests/mp_worker.py`). This is the multi-host execution path the virtual
8-device tests cannot cover: real process boundaries, a real coordinator,
collectives over the inter-process transport.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_ba():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-process run timed out; partial output: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"pid {p.pid} failed:\n{out}"
    assert "MULTIPROC OK" in outs[0], outs[0]
