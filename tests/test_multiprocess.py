"""Multi-PROCESS distributed CsrMV: 2 spawned processes x 4 CPU devices.

SURVEY.md §5: the TPU-native framework adds ``jax.distributed.initialize``
multi-host support (the reference is single-process, single-device).  The
single-process 8-device mesh tests (test_distributed.py) cannot see
process-boundary bugs — wrong addressable-shard handling, device_put of
global shardings, collective setup across hosts — so this spawns real
processes (tools/mp_distributed_worker.py) and asserts both verify their
own y windows against gold.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tools", "mp_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_csrmv():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the axon PJRT plugin hijacks even JAX_PLATFORMS=cpu runs — strip it
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env["PYTHONPATH"].split(os.pathsep)
        if "axon" not in p)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    nproc = 2
    procs = [subprocess.Popen(
        [sys.executable, "-u", _WORKER, str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    outs = []
    failed_timeout = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
        except subprocess.TimeoutExpired:
            failed_timeout = True
            outs.append("<timeout>")
    if failed_timeout:
        for p in procs:
            if p.poll() is None:
                p.kill()   # exact child PIDs we spawned
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for i, p in enumerate(procs):
        if p.returncode != 0 and "unimplemented" in outs[i].lower():
            pytest.skip(f"jax.distributed unsupported here:\n{outs[i][-400:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
        assert "PASS" in outs[i], outs[i]
