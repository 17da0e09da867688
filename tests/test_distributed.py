"""Two-process jax.distributed CPU test (VERDICT r4 item 5).

Launches 2 subprocesses x 4 virtual CPU devices each and drives the real
Executor multi-host path: coordinator init, per-process data sharding via
jax.make_array_from_process_local_data, and GSPMD gradient all-reduce.
The reference has no distributed tests at all (SURVEY §4); its multi-node
path is chunkformer/utils/train_utils.py:254-274."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO,
    })
    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py"),
             str(pid), str(nproc), str(port), str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (stdout[-2000:], stderr[-4000:])
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))

    # both processes advanced the same number of steps and hold identical
    # (all-reduced) parameters
    assert results[0]["step"] == results[1]["step"] == 3
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"],
                                                   rel=1e-6)
