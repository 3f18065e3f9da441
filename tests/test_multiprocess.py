"""REAL multi-process distributed test (SURVEY §2 multi-host plan).

Round 2 proved multi-host batch coherence only against monkeypatched
jax.process_count/process_index stubs; this launches TWO actual OS
processes, each with 4 fake CPU devices, wires them together with
`multihost_init()` → jax.distributed.initialize (gloo CPU collectives),
and runs the real code paths end-to-end:

* a Loader epoch over a cross-process 8-device mesh — every host must
  assemble the SAME global batches from its addressable shards;
* one data-parallel DDPM train step jitted over the global mesh — both
  hosts must agree on the loss and on the updated parameters.

The parent asserts both processes print identical global batch checksums,
losses, and post-step parameter checksums.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # two full CPU compiles

WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

import numpy as np
import jax.numpy as jnp

from polyp_tpu.parallel import make_mesh, multihost_init, replicate_to
from polyp_tpu.data.pipeline import Loader

multihost_init()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh({"data": 8}, jax.devices())

# identical fabricated corpus on both hosts (same seed, no striding)
rng = np.random.default_rng(0)
images = rng.integers(0, 255, (24, 8, 8, 3), np.uint8)
labels = (np.arange(24) % 3).astype(np.int32)
loader = Loader(images, labels, 8, seed=0, mesh=mesh, process_shard=True)
assert loader._spans_processes, "mesh must span both processes"

@jax.jit
def batch_sum(x):
    return jnp.sum(x.astype(jnp.float32))

batches = list(loader)
sums = [round(float(batch_sum(b[0])), 2) for b in batches]

# one REAL data-parallel train step over the global mesh
from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.models.unet2d import tiny_scratch_unet
from polyp_tpu.train.scratch_ddpm import create_ddpm_state, ddpm_train_step

cfg = DiffusionConfig(image_size=8, train_batch_size=8, num_epochs=1,
                      num_train_timesteps=10).with_schedule(len(loader))
state = create_ddpm_state(cfg, tiny_scratch_unet(), jax.random.PRNGKey(0))
state = replicate_to(state, mesh)
sched = DiffusionSchedule.create(10)
state, loss = ddpm_train_step(state, sched, batches[0][0],
                              jax.random.PRNGKey(1))
param_sum = float(batch_sum(
    jnp.concatenate([jnp.ravel(x).astype(jnp.float32)
                     for x in jax.tree_util.tree_leaves(state.params)])))

print(json.dumps({
    "process": jax.process_index(),
    "nbatches": len(batches),
    "batch_sums": sums,
    "loss": round(float(loss), 6),
    "param_sum": round(param_sum, 3),
}), flush=True)
"""


def test_single_process_env_is_noop(monkeypatch):
    """JAX_PROCESS_COUNT=1 without a coordinator (e.g. a leftover env var on
    a single-host run) must stay a no-op, not reach
    jax.distributed.initialize() and die on a missing coordinator_address."""
    from polyp_tpu.parallel import multihost_init

    monkeypatch.setenv("JAX_PROCESS_COUNT", "1")
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    multihost_init()  # raises ValueError if the guard regresses


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_loader_and_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    repo = str(Path(__file__).resolve().parents[1])

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_PROCESS_COUNT": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": repo + ":" + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-4000:]
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    a, b = sorted(outs, key=lambda d: d["process"])
    assert a["process"] == 0 and b["process"] == 1
    assert a["nbatches"] == b["nbatches"] == 3
    # both hosts saw the SAME global batches …
    assert a["batch_sums"] == b["batch_sums"]
    # … and agree on the DP step's loss and updated parameters
    assert a["loss"] == b["loss"]
    assert a["param_sum"] == b["param_sum"]
