"""End-to-end proof through the JAX device backend: the full prover/verifier
pipeline (witness-commitment MSMs, IPA folds, verifier mega-MSM) running on
batched limb kernels instead of the host integer backend."""

import pytest

from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.utils import get_generators


@pytest.fixture
def jax_backend():
    old_mode = backend_mod._mode
    old_thresh = backend_mod.DEVICE_THRESHOLD
    backend_mod.set_backend("jax")
    backend_mod.DEVICE_THRESHOLD = 1
    yield
    backend_mod.set_backend(old_mode)
    backend_mod.DEVICE_THRESHOLD = old_thresh


def test_range_proof_on_device_backend(jax_backend, rng):
    """BASELINE config #1 (single range proof), device compute path."""
    n_bits = 8                       # small: CI compiles stay bounded
    G = get_generators("G", 32)
    H = get_generators("H", 32)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    proof, comms = bound_check.gen_proof_of_bounded_num(
        57, None, 10, 100, n_bits, rng, b"BoundCheck", g, h, G, H)
    bound_check.verify_proof_of_bounded_num(
        10, 100, n_bits, proof, comms, b"BoundCheck", g, h, G, H)
