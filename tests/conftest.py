"""Test harness: run everything on an 8-virtual-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-device collective paths are
exercised via XLA's host-platform device-count simulation instead of real
chips. Must run before jax is imported anywhere.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel), which
# would send every test op through a ~10s remote compile. jax is already
# imported at interpreter startup (sitecustomize registers the axon backend),
# so the env var alone is too late — update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
