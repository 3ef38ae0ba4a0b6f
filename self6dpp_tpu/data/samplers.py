"""Sampling strategies for training iterators.

Parity target: core/utils/my_distributed_sampler.py (TrainingSampler:17,
RepeatFactorTrainingSampler:62, InferenceSampler:177,
InfiniteSubsetRandomSampler:208, ...DistanceInverse:237,
BatchSeparatedBatchSampler:267). Distribution is handled by the jax mesh
(each host takes its slice), so these are plain numpy index generators.
"""

from __future__ import annotations

import itertools
from typing import Iterator

import numpy as np


def process_shard(indices: Iterator[int], process_id: int,
                  process_count: int) -> Iterator[int]:
    """Per-process shard of a shared index stream: process r of P yields
    ``indices[r::P]`` (every sampler is seeded identically on every process,
    so the strided slices partition each shuffled epoch exactly).

    This is the reference's distributed-sampler contract
    (core/utils/my_distributed_sampler.py:48-50 — each rank takes
    ``islice(infinite_indices, rank, None, world_size)`` under the d2
    launcher); here the "rank" is ``jax.process_id()`` and the sharded
    stream feeds each process's local slice of the global batch
    (parallel.mesh.shard_batch assembles it via
    jax.make_array_from_process_local_data)."""
    yield from itertools.islice(indices, process_id, None, process_count)


def training_sampler(n: int, seed: int = 0, shuffle: bool = True
                     ) -> Iterator[int]:
    """Infinite stream of indices (shuffled per epoch)."""
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        yield from order


def repeat_factor_sampler(repeat_factors: np.ndarray, seed: int = 0
                          ) -> Iterator[int]:
    """Category-rebalanced infinite sampler: index i appears
    floor(rf_i) + Bernoulli(frac(rf_i)) times per epoch."""
    rng = np.random.default_rng(seed)
    rf = np.asarray(repeat_factors, dtype=np.float64)
    while True:
        ints = np.floor(rf).astype(int)
        frac = rf - ints
        reps = ints + (rng.random(len(rf)) < frac)
        idx = np.repeat(np.arange(len(rf)), reps)
        rng.shuffle(idx)
        yield from idx


def repeat_factors_from_category_frequency(cat_ids: np.ndarray,
                                           repeat_thresh: float = 0.01
                                           ) -> np.ndarray:
    """sqrt(t / f_c) repeat factors (LVIS recipe, as in the reference)."""
    cats, counts = np.unique(cat_ids, return_counts=True)
    freq = counts / len(cat_ids)
    per_cat = {c: max(1.0, np.sqrt(repeat_thresh / f))
               for c, f in zip(cats, freq)}
    return np.asarray([per_cat[c] for c in cat_ids])


def inference_sampler(n: int) -> Iterator[int]:
    """Sequential, one pass."""
    yield from range(n)


def infinite_subset_random_sampler(n: int, subset_ratio: float = 1.0,
                                   seed: int = 0,
                                   weights: np.ndarray | None = None
                                   ) -> Iterator[int]:
    """Each epoch draws a random subset (ratio) and iterates it; optional
    sampling weights (the DistanceInverse variant passes inverse-distance
    weights)."""
    rng = np.random.default_rng(seed)
    k = max(int(n * subset_ratio), 1)
    p = None
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        p = w / w.sum()
    while True:
        idx = rng.choice(n, size=k, replace=False, p=p)
        yield from idx


def batch_separated_batches(group_ids: np.ndarray, batch_size: int,
                            seed: int = 0) -> Iterator[np.ndarray]:
    """Batches never mix group ids (BatchSeparatedBatchSampler — used when
    different datasets/objects must not share a batch)."""
    rng = np.random.default_rng(seed)
    groups: dict = {}
    for i, gid in enumerate(group_ids):
        groups.setdefault(gid, []).append(i)
    while True:
        pools = {g: rng.permutation(v).tolist() for g, v in groups.items()}
        order = rng.permutation(list(pools))
        for g in order:
            pool = pools[g]
            for s in range(0, len(pool) - batch_size + 1, batch_size):
                yield np.asarray(pool[s : s + batch_size])
