"""Production-path multi-host worker: the REAL tiny-GDRN train step across
processes (test_multihost.py::test_two_process_gdrn_train).

Run as: python multihost_gdrn_worker.py <rank> <port> <nprocs> <ckpt_dir>

nprocs=2: each process exposes 2 virtual CPU devices; jax.distributed forms
the 2x2=4-device global mesh (the reference's d2 launch role,
core/utils/my_comm.py:198-230). Each process draws DISTINCT record indices
from the shared-seed sampler via its process shard
(data/samplers.py::process_shard — the reference's
my_distributed_sampler.py:48-50 islice(rank, None, world) contract), builds
only its local half of the global batch, and shard_batch assembles the
global array (jax.make_array_from_process_local_data). The fsdp=2 mesh axis
shards the params, the state is orbax-saved from its SHARDED layout and
restored into a fresh sharded template.

nprocs=1: the parity oracle — one process, 4 virtual devices, same mesh,
same records (both emulated process shards concatenated in rank order =
exactly the global array the 2-process run assembles). The test asserts the
printed per-step losses match across the two runs, proving the multi-host
collectives, the per-process data feeding, and the sharded save/restore all
compute the single-controller answer.
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
nprocs = int(sys.argv[3])
ckpt_dir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
# 2x2=4 global devices (not 8): CPU-SPMD partitioning dominates compile time
# on the 1-core test rig, and 4 partitions already exercise a real
# data x fsdp mesh split across 2 processes
local_devices = 4 if nprocs == 1 else 2
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Shared persistent compile cache: the oracle and both ranks (and repeated
# CI runs) compile the same programs — only the first payer is slow.
_cache = os.environ.get("S6TPU_MH_CACHE", "/tmp/s6tpu_mh_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# init_distributed must run before ANY JAX call that initialises the XLA
# backend. The engine import chain (self6dpp_tpu.ops) touches the backend at
# import time, so pull in ONLY the import-light mesh module first, bring up
# jax.distributed, and import the rest afterwards.
from self6dpp_tpu.parallel.mesh import (init_distributed, make_mesh,  # noqa: E402
                                        shard_batch, shard_state)

if nprocs > 1:
    init_distributed(f"localhost:{port}", num_processes=nprocs,
                     process_id=rank)
    assert jax.process_count() == nprocs
assert len(jax.devices()) == 4, jax.devices()

import numpy as np  # noqa: E402

from self6dpp_tpu.config.base import Config, DistConfig  # noqa: E402
from self6dpp_tpu.data.samplers import process_shard, training_sampler  # noqa: E402
from self6dpp_tpu.data.synthetic import make_gdrn_batch  # noqa: E402
from self6dpp_tpu.engine import gdrn_engine as eng  # noqa: E402
from self6dpp_tpu.engine.checkpoint import CheckpointManager  # noqa: E402

from __graft_entry__ import _flagship_cfg  # noqa: E402

cfg0 = _flagship_cfg(tiny=True)
cfg = Config(model=cfg0.model, solver=cfg0.solver,
             dist=DistConfig(mesh_shape=(2, 2)))
mesh = make_mesh(cfg.dist)

# ---- per-process data feeding through the sampler's process shard --------
POOL, GLOBAL_BS, WORLD = 16, 8, 2
pool = make_gdrn_batch(cfg, POOL, seed=0, n_points=32)


def local_indices(r: int) -> list[int]:
    stream = process_shard(training_sampler(POOL, seed=0), r, WORLD)
    return [int(next(stream)) for _ in range(GLOBAL_BS // WORLD)]


def take(idx: list[int]) -> dict:
    return {k: v[np.asarray(idx)] if v.ndim > 0 and v.shape[0] == POOL else v
            for k, v in pool.items()}


if nprocs == 1:
    # oracle: the full global batch, in the device order the 2-process run
    # assembles it (process 0's shard rows first)
    my_idx = local_indices(0) + local_indices(1)
else:
    my_idx = local_indices(rank)
other = local_indices(1 - rank) if nprocs > 1 else []
assert not set(my_idx) & set(other), (my_idx, other)  # distinct records
local = take(my_idx)
db = shard_batch(local, mesh, cfg.dist)
assert db["roi_img"].shape[0] == GLOBAL_BS, db["roi_img"].shape

# Per-row evidence of the global assembly ORDER (ADVICE r4: total_loss is a
# permutation-invariant mean, so loss parity alone cannot catch shard_batch
# placing rows out of order). Each process prints the checksum of every
# global row it holds an addressable shard of; the test asserts the union
# across ranks equals the oracle's row->checksum map exactly, index by index.
_rows = {}
for _shard in db["roi_img"].addressable_shards:
    _start = _shard.index[0].start or 0
    _data = np.asarray(_shard.data)
    for _i in range(_data.shape[0]):
        _rows[_start + _i] = float(_data[_i].astype(np.float64).sum())
print(f"RANK{rank} ROWS "
      + " ".join(f"{i}={_rows[i]:.6f}" for i in sorted(_rows)), flush=True)

# ---- sharded model state (fsdp axis is real) ------------------------------
model = eng.build_gdrn(cfg)
state = eng.init_state(cfg, model, take(list(range(GLOBAL_BS))),
                       rng=jax.random.PRNGKey(0), mesh=mesh)
assert any(
    any(s < g for s, g in zip(p.sharding.shard_shape(p.shape), p.shape))
    for p in jax.tree.leaves(state.params) if p.ndim > 0), "not fsdp-sharded"

step = eng.jit_train_step(cfg, model, mesh=mesh)
state, m1 = step(state, db, jax.random.PRNGKey(1))
state, m2 = step(state, db, jax.random.PRNGKey(2))
loss1, loss2 = float(m1["total_loss"]), float(m2["total_loss"])

# ---- orbax save from the sharded layout, restore into a fresh template ----
mgr = CheckpointManager(ckpt_dir, save_period=1)
assert mgr.save(state, step=2, force=True)
fresh = eng.init_state(cfg, model, take(list(range(GLOBAL_BS))),
                       rng=jax.random.PRNGKey(99), mesh=mesh)
restored = mgr.restore(fresh, step=2)
restored = shard_state(restored, mesh, cfg.dist)
state, m3 = step(restored, db, jax.random.PRNGKey(3))
loss3 = float(m3["total_loss"])

print(f"RANK{rank} loss1={loss1:.6f} loss2={loss2:.6f} loss3={loss3:.6f} OK",
      flush=True)
if nprocs > 1:
    jax.distributed.shutdown()
