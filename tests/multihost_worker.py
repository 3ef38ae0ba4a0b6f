"""Worker for the two-process multi-host CPU test (test_multihost.py).

Run as: python multihost_worker.py <rank> <port>

Each process exposes 4 virtual CPU devices; jax.distributed assembles the
2x4=8-device global mesh (the reference's d2 launch/init_dist role,
core/utils/my_comm.py:198-230). Each process feeds ONLY its local half of
the global batch through shard_batch (jax.make_array_from_process_local_data
path) and runs one jitted SGD step; the global loss mixes both processes'
data, so equal printed losses prove cross-process collectives ran.
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from self6dpp_tpu.config.base import DistConfig  # noqa: E402
from self6dpp_tpu.parallel.mesh import (init_distributed, make_mesh,  # noqa: E402
                                        shard_batch)

init_distributed(f"localhost:{port}", num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

dist = DistConfig(mesh_shape=(-1, 1))
mesh = make_mesh(dist)

# local half of a global bs=16 batch: rank 0 rows are 0.0, rank 1 rows 1.0
local = {"x": np.full((8, 4), float(rank), np.float32),
         "table": np.arange(4, dtype=np.float32)}       # replicated leaf
db = shard_batch(local, mesh, dist)
assert db["x"].shape == (16, 4), db["x"].shape           # GLOBAL shape
assert db["table"].shape == (4,)

params = {"w": jnp.ones((4,))}


@jax.jit
def step(params, batch):
    def loss_fn(p):
        y = batch["x"] @ p["w"] + batch["table"].sum() * 0.0
        return (y * y).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_p = jax.tree.map(lambda a, g: a - 0.1 * g, params, grads)
    return new_p, loss


params, loss = step(params, db)
# global loss: rank-1 rows give (1*4)^2=16, rank-0 rows 0 -> mean 8.0
print(f"RANK{rank} loss={float(loss):.6f} OK", flush=True)
jax.distributed.shutdown()
