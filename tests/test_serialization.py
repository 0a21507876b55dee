"""Proof serialization round trips (`proof.rs:24` / `ipp.rs:13` serde
parity): bytes and JSON encodings must round-trip and still verify."""

import pytest

from bulletproofs_tpu import R1CSProof
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.utils import (FormatError, VerificationError,
                                    get_generators)


def test_proof_serialization_roundtrip(rng):
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    proof, comms = bound_check.gen_proof_of_bounded_num(
        57, None, 10, 100, 16, rng, b"Ser", g, h, G, H)

    blob = proof.to_bytes()
    restored = R1CSProof.from_bytes(blob)
    assert restored.to_bytes() == blob
    bound_check.verify_proof_of_bounded_num(
        10, 100, 16, restored, comms, b"Ser", g, h, G, H)

    js = proof.to_json()
    restored2 = R1CSProof.from_json(js)
    assert restored2.to_bytes() == blob

    # corrupting any byte must break verification (or parsing)
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 1
    with pytest.raises((VerificationError, AssertionError, ValueError)):
        p = R1CSProof.from_bytes(bytes(bad))
        bound_check.verify_proof_of_bounded_num(
            10, 100, 16, p, comms, b"Ser", g, h, G, H)


def test_byte_flip_fuzz_never_verifies(rng):
    """Soundness fuzz: flipping ANY single bit of a serialized proof must
    be rejected (clean parse/verification error, never acceptance, never
    an uncontrolled crash class like segfault-by-index)."""
    import random
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    proof, comms = bound_check.gen_proof_of_bounded_num(
        57, None, 10, 100, 16, rng, b"Fuzz", g, h, G, H)
    blob = proof.to_bytes()
    frng = random.Random(0xF022)
    positions = frng.sample(range(len(blob)), 40)
    for pos in positions:
        bad = bytearray(blob)
        bad[pos] ^= 1 << frng.randrange(8)
        try:
            p = R1CSProof.from_bytes(bytes(bad))
            bound_check.verify_proof_of_bounded_num(
                10, 100, 16, p, comms, b"Fuzz", g, h, G, H)
        except (FormatError, VerificationError, AssertionError,
                ValueError):
            continue
        raise AssertionError(
            f"byte-flip at {pos} produced an ACCEPTED proof")
