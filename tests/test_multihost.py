"""Multi-host DP: 2 processes x 4 virtual CPU devices, gloo collectives.

Drives tools/multihost_smoke.py — per-process DeviceStore shard uploads,
replicated-consistent sharded index vectors, and the jitted shard_map train
step across process boundaries (SURVEY §2.12 DCN scope; VERDICT r1 #8)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_device_store_training():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "multihost_smoke.py")
    port = _free_port()
    env = dict(os.environ)
    # the smoke script pins JAX_PLATFORMS=cpu itself; scrub plugin hooks
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", "4", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    # 1500s: the two subprocesses each compile a shard_map train step on
    # host CPU; when a TPU campaign (trainer + watchdog) shares this VM the
    # compile alone can exceed 10 min (observed 2026-08-19: 600s timeout hit
    # with XLA's slow_operation_alarm firing mid-compile).
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    lines = [
        l for out in outs for l in out.splitlines() if l.startswith("MULTIHOST OK")
    ]
    assert len(lines) == 2, outs
    # both processes computed the same (psum-reduced) loss
    assert lines[0] == lines[1], lines
