"""Multi-process SPMD test: 2 jax.distributed processes, one global mesh.

Validates the real multi-host code path (jax.distributed.initialize, per-
process input sharding, make_array_from_process_local_data assembly,
collective gradient sync) that replaces the reference's parameter-server
topology (SURVEY.md §2.16) — something the reference never tested at all.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(small_conf_dir, tmp_path):
    port = str(_free_port())
    svc_port = str(_free_port())
    shared_model_dir = str(tmp_path / "shared_model")
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(i), "2", port, small_conf_dir, shared_model_dir, svc_port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"RESULT p\d+ loss=([\d.]+) eval_loss=([\d.]+)", out)
        assert m, out[-2000:]
        losses.append((float(m.group(1)), float(m.group(2))))
    # synchronous SPMD: both processes must agree bit-for-bit on the loss
    assert losses[0] == losses[1], losses
    # uneven-shard run (5 vs 4 rows, per-host batch 4): the batch-count sync
    # protocol must complete without deadlock and agree on the eval loss
    uneven = []
    for out in outs:
        m = re.search(r"RESULT2 p\d+ loss9=([\d.]+) eval9=([\d.]+)", out)
        assert m, out[-2000:]
        uneven.append((float(m.group(1)), float(m.group(2))))
    assert uneven[0][1] == uneven[1][1], uneven
    # input-service run: one loader fed both processes the per-shard
    # kernel plans; synchronous SPMD must still agree bit-for-bit
    svc = []
    for out in outs:
        m = re.search(r"RESULT3 p\d+ loss_svc=([\d.]+) eval_svc=([\d.]+)",
                      out)
        assert m, out[-2000:]
        svc.append((float(m.group(1)), float(m.group(2))))
    assert svc[0] == svc[1], svc
