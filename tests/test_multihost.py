"""F-19 multi-host smoke test (VERDICT r1 next-round #8): two
jax.distributed processes on localhost CPU form one 4-device global mesh
and run a data-parallel train step. Covers parallel/mesh.py's
maybe_init_distributed, the last untested line of F-19."""

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


def test_two_process_localhost_mesh(tmp_path):
    """Two jax.distributed processes form one 4-device mesh and run (a) a
    DP train step (F-19) and (b) the tier-3 spatially-sharded whole-scene
    forward (F-22) whose ppermute ghost ring crosses the process boundary;
    the stitched tier-3 logits must match a single-process golden computed
    first on 4 fake devices in one process."""
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    golden = str(tmp_path / "tier3_golden.npz")

    genv = dict(os.environ, TIER3_MODE="golden", TIER3_GOLDEN=golden,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4",
                PYTHONPATH=root + os.pathsep
                + os.environ.get("PYTHONPATH", ""))
    # the golden subprocess must NOT inherit coordinator env from outer
    # harnesses
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        genv.pop(k, None)
    gp = subprocess.run([sys.executable, worker], env=genv,
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True, timeout=240)
    assert gp.returncode == 0 and "golden: OK" in gp.stdout, \
        gp.stdout[-3000:]

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            TIER3_GOLDEN=golden,
            PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out, out[-3000:]
        assert f"proc {pid}: TIER3 OK" in out, out[-3000:]
