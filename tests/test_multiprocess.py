r"""Launches the real multi-process distributed path (VERDICT r4 #3).

Every other multi-device test runs one process with 8 virtual devices; this
one starts TWO actual CPU processes (2 local devices each) against a live
coordinator and asserts `initialize_distributed`, `make_hybrid_mesh` over the
global device set, a cross-process reduction, and a dp loss/gradient step all
execute and agree with the single-process result
(`tools/multiprocess_check.py`).
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.parity  # slow CI tier (two cold jax processes)

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    coordinator = f"localhost:{_free_port()}"
    nproc = 2

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [str(ROOT), env.get("PYTHONPATH", "")])
    )

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(ROOT / "tools" / "multiprocess_check.py"),
                str(pid),
                str(nproc),
                coordinator,
            ],
            env=env,
            cwd=ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]

    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "MULTIPROCESS_OK" in out, f"process {pid} output:\n{out[-3000:]}"

    # Both processes computed the same replicated psum and loss.
    lines = [
        line
        for out in outputs
        for line in out.splitlines()
        if line.startswith("MULTIPROCESS_OK")
    ]
    assert len(lines) == nproc and len(set(lines)) == 1, lines
