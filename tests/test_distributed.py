"""Real multi-process jax.distributed test on localhost (SURVEY.md §4.5):
two OS processes form a global 2-device CPU mesh and run sharded PPO
updates — exercising the same process-group + collective code paths as a
multi-host pod, without a cluster."""

import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_two_process_training(backend):
    port = free_port()
    n = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             str(i), str(n), str(port), backend],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    losses = []
    for out in outs:
        m = re.search(r"DIST_OK pid=\d+ update=2 loss=([-\d.]+)", out)
        assert m, f"no DIST_OK line:\n{out[-2000:]}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], "replicated loss diverged across processes"
