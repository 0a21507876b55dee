"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not available
in CI): env vars must be set before jax is imported anywhere.
"""

import os

# The environment pins JAX_PLATFORMS=axon (the tunneled real-TPU plugin) and a
# sitecustomize re-registers it, so an env-var override is not enough: force
# the CPU platform through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# low scan-unroll: fast XLA-CPU compiles (TPU runs use high unroll)
# native C++ backend is the default for protocol round-trips; the exact-int
# host backend is the ground truth in cross-checks (test_cross_backend) and
# device kernels are covered explicitly in test_device_ops / test_backend_jax
os.environ.setdefault("BP_BACKEND", "cpp")
os.environ.setdefault("BP_UNROLL", "4")
os.environ.setdefault("BP_CIOS_UNROLL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# SEPARATE cache dir from the TPU runs: mixing AOT artifacts compiled for
# different machine targets in one directory segfaults the cache loader
# ("machine type ... doesn't match", cpu_aot_loader) — tests must never
# read entries produced by the axon/TPU toolchain.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


@pytest.fixture
def rng():
    """Deterministic RNG for reproducible proofs."""
    return random.Random(0xB1E55)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-process compiled executables after each test module: long
    pytest runs accumulate hundreds of XLA:CPU executables and have hit
    loader/compiler segfaults; the persistent disk cache makes re-tracing
    cheap.  (Also: never run other jax processes against the same cache
    dir while the suite runs.)"""
    yield
    jax.clear_caches()
