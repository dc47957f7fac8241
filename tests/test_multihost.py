"""Multi-host glue (parallel/multihost.py): a REAL 2-process
`jax.distributed` dryrun over CPU, plus the single-process behaviour of
the helpers.

The 2-process case can't run inside the test process (jax is already
initialized single-process by conftest), so it spawns two fresh Python
subprocesses that rendezvous through a local coordinator and jointly
execute one data-parallel train step on a 4-device global mesh (2 local
CPU devices each) — the same initialize / host_batch_slice /
global_batch / is_coordinator sequence a per-host launcher would run on
a multi-host TPU slice. No reference counterpart (the reference is
single-process single-device, SURVEY.md §5.8).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

from efficient_rpe_vit_tpu.parallel import (
    global_batch, host_batch_slice, initialize_multihost, is_coordinator,
    make_mesh, make_parallel_train_step, create_sharded_train_state,
)
from efficient_rpe_vit_tpu.parallel.multihost import broadcast_scalar, sync

initialize_multihost(coordinator_address="localhost:" + port,
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert is_coordinator() == (pid == 0)

import jax.numpy as jnp
import numpy as np
from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model

cfg = mnist_config(dropout=0.0)
model = create_model("performer_relu_rope", cfg)
mesh = make_mesh(n_model=1)            # 4 GLOBAL devices, pure DP
assert mesh.devices.size == 4

rng = jax.random.PRNGKey(0)            # identical on every process
state, specs = create_sharded_train_state(
    model, cfg, rng, jnp.zeros((2, 28, 28, 1)), mesh)
step = make_parallel_train_step(model, mesh, specs)

# every process computes the same global epoch order, loads only its rows
B = 8
gx = np.random.RandomState(1).randn(B, 28, 28, 1).astype(np.float32)
gy = (np.arange(B) %% 10).astype(np.int32)
sl = host_batch_slice(B)
batch = global_batch({"x": gx[sl], "y": gy[sl]}, mesh)
state, loss, correct = step(state, batch["x"], batch["y"], rng)
jax.block_until_ready(state.params)

seed = broadcast_scalar(1234 if pid == 0 else -1)
assert seed == 1234, seed
sync("epoch-end")
print("MH_OK", pid, float(loss), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_dp_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", "9934"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MH_OK {i}" in out, out[-3000:]
    # both processes computed the SAME global loss
    losses = {o.split("MH_OK")[1].split()[1] for o in outs}
    assert len(losses) == 1, losses


def test_host_batch_slice_single_process():
    from efficient_rpe_vit_tpu.parallel import host_batch_slice

    # one process owns the whole batch (any size divides by 1)
    assert host_batch_slice(32) == slice(0, 32)
    assert host_batch_slice(33) == slice(0, 33)


def test_global_batch_single_process_matches_device_put():
    """On one process, global_batch == sharding a full numpy batch."""
    from efficient_rpe_vit_tpu.parallel import global_batch, make_mesh

    mesh = make_mesh(n_model=1)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    g = global_batch(x, mesh)
    assert g.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(g), x)
    assert len(g.sharding.device_set) == mesh.devices.size
