"""Two-process CPU jax.distributed execution test (VERDICT r2 item 7).

Launches 2 subprocesses that jax.distributed.initialize against a local
coordinator, each with 2 virtual CPU devices, and asserts:
  - NumpyLoader shard union == one epoch, disjoint across processes
  - shard_batch's make_array_from_process_local_data branch assembles the
    global batch (local B -> global 2B) and jit computes on it
  - is_main() guards host artifacts to exactly one writer
The reference's equivalent is dormant NCCL bootstrapping it never calls
(/root/reference/CLTR/misc.py:442-464)."""

import json
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


@pytest.mark.timeout(300)
def test_two_process_distributed(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    seen0 = json.load(open(tmp_path / "seen0.json"))
    seen1 = json.load(open(tmp_path / "seen1.json"))
    assert sorted(seen0 + seen1) == list(range(8))
    assert not set(seen0) & set(seen1)

    out0 = json.load(open(tmp_path / "out0.json"))
    out1 = json.load(open(tmp_path / "out1.json"))
    assert out0["global_shape"] == out1["global_shape"]
    assert out0["global_shape"][0] == 4  # local 2 -> global 4
    # both processes computed on the same assembled global batch
    assert out0["global_batch_sum"] == out1["global_batch_sum"]

    # exactly one is_main() writer
    lines = open(tmp_path / "main_artifact.txt").read().splitlines()
    assert lines == ["proc0"]
