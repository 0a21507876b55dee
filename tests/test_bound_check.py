"""Range proof via bound_check gadget (mirrors `bound_check.rs:181-226`)."""

import pytest

from bulletproofs_tpu import set_backend
from bulletproofs_tpu.models.bound_check import (gen_proof_of_bounded_num,
                                                 verify_proof_of_bounded_num)
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.utils.errors import R1CSError

set_backend("host")


def _setup(n_gens=128):
    return (get_generators("G", n_gens), get_generators("H", n_gens),
            G1.from_msg_hash(b"g"), G1.from_msg_hash(b"h"))


def test_bound_check_roundtrip(rng):
    G, H, g, h = _setup()
    v = rng.randrange(10, 100)
    proof, comms = gen_proof_of_bounded_num(
        v, Scalar.random(rng), 10, 100, 32, rng, b"BoundsTest", g, h, G, H)
    verify_proof_of_bounded_num(10, 100, 32, proof, comms, b"BoundsTest",
                                g, h, G, H)


def test_bound_check_64bit(rng):
    """BASELINE config #1: single 64-bit range proof."""
    G, H, g, h = _setup(256)
    lo, hi = 0, (1 << 64) - 1
    v = rng.randrange(lo, hi)
    proof, comms = gen_proof_of_bounded_num(
        v, Scalar.random(rng), lo, hi, 64, rng, b"Bounds64", g, h, G, H)
    verify_proof_of_bounded_num(lo, hi, 64, proof, comms, b"Bounds64",
                                g, h, G, H)


def test_wrong_bounds_rejected(rng):
    G, H, g, h = _setup()
    proof, comms = gen_proof_of_bounded_num(
        55, Scalar.random(rng), 10, 100, 32, rng, b"BoundsTest", g, h, G, H)
    with pytest.raises(R1CSError):
        verify_proof_of_bounded_num(10, 90, 32, proof, comms, b"BoundsTest",
                                    g, h, G, H)


def test_tampered_proof_rejected(rng):
    G, H, g, h = _setup()
    proof, comms = gen_proof_of_bounded_num(
        55, Scalar.random(rng), 10, 100, 32, rng, b"BoundsTest", g, h, G, H)
    proof.e_blinding = proof.e_blinding + Scalar.one()
    with pytest.raises(R1CSError):
        verify_proof_of_bounded_num(10, 100, 32, proof, comms, b"BoundsTest",
                                    g, h, G, H)


def test_tampered_commitment_rejected(rng):
    G, H, g, h = _setup()
    proof, comms = gen_proof_of_bounded_num(
        55, Scalar.random(rng), 10, 100, 32, rng, b"BoundsTest", g, h, G, H)
    comms = [comms[0] + G1.generator(), comms[1], comms[2]]
    with pytest.raises(R1CSError):
        verify_proof_of_bounded_num(10, 100, 32, proof, comms, b"BoundsTest",
                                    g, h, G, H)
