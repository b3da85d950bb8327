"""Multi-process comm backend (SURVEY §5.8): two real jax.distributed
processes on localhost must form a cross-process mesh and agree on a
sharded reduction. This is the honest multi-PROCESS check the virtual
8-device mesh (everything else in tests/) cannot provide.

Reference analog: none — the reference is single-process by design
(SURVEY §2.5); this is the TPU-native replacement's integration test.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_and_psum():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ar_orbslam2_tpu.parallel.multihost"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"multihost process hung:\n{out}")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {i} rc={p.returncode}:\n{out}"
        assert "-> OK" in out, f"process {i} output:\n{out}"
        assert "2 global devices" in out or "global devices" in out
