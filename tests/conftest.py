"""Test env: force CPU with 8 virtual devices (SURVEY.md §4.5) so sharding
logic is unit-testable without a pod, and tests never contend for the one
real TPU chip.

Note: this image's sitecustomize force-registers the `axon` TPU platform
and sets jax_platforms="axon,cpu", so JAX_PLATFORMS in the environment is
NOT honored — we must override jax.config after import, before any backend
is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
