"""Device mesh + sharding rules.

Replaces the reference's NCCL/Horovod dual backend (core/utils/my_comm.py)
with one jax.sharding data mesh: loss reduction and eval gathers become XLA
collectives over ICI. The `fsdp` axis additionally shards large parameters
(a capability the reference lacks — SURVEY.md §2.7: data-parallel only).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.base import DistConfig


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Multi-host (multi-process) runtime init — the reference covers
    multi-machine via d2 launch/init_dist over NCCL or Horovod
    (core/utils/my_comm.py:198-230); here ONE call brings up jax.distributed
    and every collective rides the same mesh afterwards.

    Must run before any other JAX backend use. On CPU test rigs the
    cross-process collectives need the gloo backend — set
    ``jax.config.update("jax_cpu_collectives_implementation", "gloo")``
    (done automatically here when the platform is cpu).
    """
    if num_processes is not None and int(num_processes) <= 1:
        return
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:           # older/newer jaxlib: flag may not exist
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)


def maybe_init_distributed_from_args(args) -> None:
    """CLI hook: ``--dist-coordinator host:port --dist-nprocs N
    --dist-rank R`` (the d2 ``launch`` analog). No-op when unset."""
    coord = getattr(args, "dist_coordinator", "")
    if coord:
        init_distributed(coord, int(args.dist_nprocs), int(args.dist_rank))


def add_distributed_args(parser) -> None:
    parser.add_argument("--dist-coordinator", default="",
                        help="host:port of process 0 (multi-host training)")
    parser.add_argument("--dist-nprocs", default=1, type=int)
    parser.add_argument("--dist-rank", default=0, type=int)


def make_mesh(cfg: DistConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or DistConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(cfg.mesh_shape)
    # resolve -1 entries
    known = math.prod(s for s in shape if s > 0)
    shape = [n // known if s == -1 else s for s in shape]
    assert math.prod(shape) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (cfg.data_axis, cfg.fsdp_axis))


def batch_sharding(mesh: Mesh, cfg: DistConfig | None = None) -> NamedSharding:
    cfg = cfg or DistConfig()
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params: Any, mesh: Mesh, cfg: DistConfig | None = None,
                         min_size: int = 2 ** 16) -> Any:
    """FSDP-style rules: shard the largest axis of big params over the fsdp
    axis when divisible; replicate the rest. Returns a pytree of
    NamedSharding matching `params`."""
    cfg = cfg or DistConfig()
    fsdp = mesh.shape[cfg.fsdp_axis]

    def rule(p):
        if fsdp <= 1 or p.size < min_size:
            return NamedSharding(mesh, P())
        # pick the largest divisible axis
        order = sorted(range(p.ndim), key=lambda i: -p.shape[i])
        for ax in order:
            if p.shape[ax] % fsdp == 0:
                spec = [None] * p.ndim
                spec[ax] = cfg.fsdp_axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(batch: dict, mesh: Mesh, cfg: DistConfig | None = None,
                batch_size: int | None = None) -> dict:
    """Place a host batch onto the mesh: batch-major arrays split over the
    data axis, everything else (per-class mesh tables, scalars) replicated.

    Single-process: a plain device_put of the global batch. Multi-process
    (after init_distributed): each process passes its LOCAL slice of the
    batch and the global array is assembled via
    jax.make_array_from_process_local_data — no host ever materializes the
    global batch (the d2-launch + per-rank-loader pattern of the
    reference, my_comm.py:198-230 + TrainingSampler sharding)."""
    sh = batch_sharding(mesh, cfg)
    repl = replicated(mesh)
    multiproc = jax.process_count() > 1
    if multiproc:
        arrs = {k: np.asarray(v) for k, v in batch.items()}
    else:
        arrs = {k: jnp.asarray(v) for k, v in batch.items()}
    if batch_size is None:
        if "roi_img" in arrs:
            batch_size = arrs["roi_img"].shape[0]
        else:
            dims = [v.shape[0] for v in arrs.values() if v.ndim > 0]
            batch_size = max(set(dims), key=dims.count) if dims else 0
    if multiproc:
        return {
            k: jax.make_array_from_process_local_data(
                sh if v.ndim > 0 and v.shape[0] == batch_size else repl, v)
            for k, v in arrs.items()
        }
    return {
        k: jax.device_put(
            v, sh if v.ndim > 0 and v.shape[0] == batch_size else repl)
        for k, v in arrs.items()
    }


def shard_state(state, mesh: Mesh, cfg: DistConfig | None = None):
    """Place a TrainState onto the mesh: params/ema sharded by
    `param_sharding_rules` over the fsdp axis, batch_stats/step replicated,
    optimizer moments sharded like the params they mirror (matched by shape —
    optax component states carry param-shaped leaves such as adam mu/nu and
    lookahead slow weights).

    This is what makes the fsdp axis real: each chip holds 1/fsdp of every
    large parameter and XLA inserts the all-gathers/reduce-scatters around
    the matmuls (the reference is data-parallel only, SURVEY.md §2.7).
    """
    cfg = cfg or DistConfig()
    rules = param_sharding_rules(state.params, mesh, cfg)
    repl = NamedSharding(mesh, P())

    shape2shard: dict[tuple, NamedSharding] = {}
    for p, s in zip(jax.tree.leaves(state.params), jax.tree.leaves(rules)):
        shape2shard.setdefault(tuple(p.shape), s)

    def put_like_param(x):
        if hasattr(x, "shape"):
            return jax.device_put(x, shape2shard.get(tuple(x.shape), repl))
        return x

    return state.replace(
        params=jax.tree.map(jax.device_put, state.params, rules),
        ema_params=(jax.tree.map(jax.device_put, state.ema_params, rules)
                    if state.ema_params is not None else None),
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, repl),
                                 state.batch_stats),
        opt_state=jax.tree.map(put_like_param, state.opt_state),
        step=jax.device_put(state.step, repl),
    )


def fsdp_size(mesh: Mesh, cfg: DistConfig | None = None) -> int:
    cfg = cfg or DistConfig()
    return mesh.shape.get(cfg.fsdp_axis, 1)


def step_shardings(mesh: Mesh, cfg: DistConfig | None = None):
    """(state_sharding, batch_sharding, replicated) for jitting train steps.

    state sharding is None (= infer from the committed input arrays) when the
    fsdp axis is active — init_state/shard_state already placed the params —
    and fully-replicated otherwise.
    """
    cfg = cfg or DistConfig()
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.data_axis))
    state = None if fsdp_size(mesh, cfg) > 1 else repl
    return state, data, repl
