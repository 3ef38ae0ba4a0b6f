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


def shard_batch(batch: dict, mesh: Mesh, cfg: DistConfig | None = None) -> dict:
    """Place a host batch onto the mesh, split over the data axis."""
    sh = batch_sharding(mesh, cfg)
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}
