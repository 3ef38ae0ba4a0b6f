"""Debugging / numerical-failure detection helpers.

The reference's failure story is minimal (SURVEY.md §5: loguru catch, finite
asserts, nan_to_num). Here the equivalents plus the JAX-native upgrades:

  * enable_nan_debugging(): turn on jax.debug_nans / debug_infs — any NaN in
    any jitted computation raises at the producing op (far stronger than the
    reference's post-hoc `assert torch.isfinite(losses)`);
  * check_finite_tree(): chex-based pytree finiteness assertion for use at
    step boundaries;
  * deterministic(): force deterministic XLA reductions for bitwise
    reproducibility runs.
"""

from __future__ import annotations

import contextlib

import chex
import jax
import numpy as np


def enable_nan_debugging(infs: bool = True) -> None:
    jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


def disable_nan_debugging() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


@contextlib.contextmanager
def nan_debugging():
    enable_nan_debugging()
    try:
        yield
    finally:
        disable_nan_debugging()


def check_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finiteness check over a pytree (raises with the leaf path)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            keys = "/".join(str(p) for p in path)
            raise FloatingPointError(
                f"non-finite values in {name} at {keys}: "
                f"nan={np.isnan(a).sum()}, inf={np.isinf(a).sum()}")


def assert_trees_close(a, b, rtol: float = 1e-5, atol: float = 1e-6) -> None:
    chex.assert_trees_all_close(a, b, rtol=rtol, atol=atol)


@contextlib.contextmanager
def deterministic():
    """Deterministic XLA GPU/TPU reductions (reproducibility runs)."""
    import os
    old = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (old + " --xla_gpu_deterministic_ops=true").strip()
    try:
        yield
    finally:
        os.environ["XLA_FLAGS"] = old
