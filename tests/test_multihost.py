"""Multi-host (multi-process) smoke test: 2 JAX processes on CPU exercise
`initialize_multihost` + a cross-process collective + per-host data sharding.

This replaces the reference's "real torchrun only" multi-node validation
(README_TRAINING.md:38-53, dist.py:78-100) with a hermetic 2-process
jax.distributed bring-up: process 0 is the coordinator, each process owns one
CPU device, and a psum over the global mesh must see BOTH hosts' data.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["FOURM_REPO"])
from fourm_tpu.parallel.launch import (
    initialize_multihost, is_main_process, process_count, process_index,
)

initialize_multihost(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert process_count() == 2, f"process_count={process_count()}"
pid = process_index()
assert pid == int(os.environ["PROC_ID"])
assert is_main_process() == (pid == 0)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devices = jax.devices()  # global across both processes
assert len(devices) == 2, f"global devices={len(devices)}"
mesh = Mesh(np.array(devices), ("data",))

# per-host data sharding: each process contributes ITS shard of the global
# batch (the multi-host input-pipeline contract: shard_id=process_index)
local = jnp.full((1, 4), float(pid + 1))  # host0 -> 1s, host1 -> 2s
global_shape = (2, 4)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), global_shape)

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(arr))
# 1*4 + 2*4 = 12 proves the collective saw BOTH hosts' shards
assert total == 12.0, f"cross-process sum wrong: {total}"
print(f"proc {pid}: ok total={total}", flush=True)
"""


def test_two_process_distributed_cpu(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = {
        **os.environ,
        "FOURM_REPO": repo,
        "COORD": f"127.0.0.1:{port}",
        # one CPU device per process (2 processes x 1 device = 2 global)
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "PROC_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok total=12.0" in out, out
