"""Cross-backend bit-exactness: the SAME seeded randomness must produce the
IDENTICAL serialized proof on the exact-int host backend, the native C++
backend, and the JAX device backend.

This is the strongest internal-consistency check available without the
reference Rust toolchain (BASELINE.md): every backend implements the same
group law and transcript schedule, so any arithmetic divergence shows up as
a byte diff (and usually as a verification failure first)."""

import random

import pytest

from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.utils import get_generators


def _proof_bytes(mode):
    from bulletproofs_tpu import ipp as ipp_mod
    old_mode = backend_mod._mode
    old_thresh = backend_mod.DEVICE_THRESHOLD
    old_ipa_min = ipp_mod.DEVICE_IPA_MIN_N
    backend_mod.set_backend(mode)
    backend_mod.DEVICE_THRESHOLD = 1
    ipp_mod.DEVICE_IPA_MIN_N = 2       # force the device IPA path coverage
    try:
        rng = random.Random(0xDE7E12)
        G = get_generators("G", 64)
        H = get_generators("H", 64)
        g = G1.from_msg_hash(b"g")
        h = G1.from_msg_hash(b"h")
        proof, comms = bound_check.gen_proof_of_bounded_num(
            57, None, 10, 100, 16, rng, b"XBackend", g, h, G, H)
        return proof.to_bytes(), [c.to_bytes() for c in comms]
    finally:
        backend_mod.set_backend(old_mode)
        backend_mod.DEVICE_THRESHOLD = old_thresh
        ipp_mod.DEVICE_IPA_MIN_N = old_ipa_min


def test_backends_bit_exact():
    host = _proof_bytes("host")
    cpp = _proof_bytes("cpp")
    jaxp = _proof_bytes("jax")
    assert host == cpp, "cpp backend diverges from host"
    assert host == jaxp, "jax backend diverges from host"
