"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's recommendation: distributed/mesh paths are tested with
``xla_force_host_platform_device_count`` so no TPU hardware is needed, and the
TPU build (unlike the reference, which has no distributed tests) exercises its
multi-chip sharding in CI.
"""

import os

# NOTE: the sandbox preloads jax with JAX_PLATFORMS=axon via sitecustomize, so
# plain env vars are too late — jax.config.update is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
