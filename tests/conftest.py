"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not available
in CI): env vars must be set before jax is imported anywhere.
"""

import os

# The environment pins JAX_PLATFORMS=axon (the tunneled real-TPU plugin) and a
# sitecustomize re-registers it, so an env-var override is not enough: force
# the CPU platform through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import random

import pytest


@pytest.fixture
def rng():
    """Deterministic RNG for reproducible proofs."""
    return random.Random(0xB1E55)
