"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not available
in CI): env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


@pytest.fixture
def rng():
    """Deterministic RNG for reproducible proofs."""
    return random.Random(0xB1E55)
