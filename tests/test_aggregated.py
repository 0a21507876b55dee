"""Aggregation + BN254 parity tests.

- BASELINE config #2: m aggregated 64-bit range proofs = m bound-check
  gadgets in ONE R1CS proof (the composition contract of
  `tests/multiple_constraint_systems.rs:25-96`; m reduced for CI).
- BASELINE config #5: the gadget suite on the BN254 curve.
"""

import pytest

from bulletproofs_tpu import Prover, Verifier, using_curve
from bulletproofs_tpu.models import bound_check, set_membership
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, Poseidon_hash_2, SboxType)
from bulletproofs_tpu.models import poseidon_hash as ph
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators


def test_aggregated_range_proofs(rng):
    """m=4 aggregated 64-bit range proofs in one proof."""
    m, bits = 4, 64
    n_gens = 1024
    G = get_generators("G", n_gens)
    H = get_generators("H", n_gens)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")

    vals = [rng.randrange(1 << 63) for _ in range(m)]
    tr = ProofTranscript(b"AggRange")
    prover = Prover(g, h, tr, rng=rng)
    comms = []
    for v in vals:
        comms.append(bound_check.prove_bounded_num(
            v, None, 0, (1 << bits) - 1, bits, rng, prover))
    assert prover.num_multipliers() == m * 2 * bits
    proof = prover.prove(G, H)

    tr2 = ProofTranscript(b"AggRange")
    verifier = Verifier(tr2)
    for c in comms:
        bound_check.verify_bounded_num(0, (1 << bits) - 1, bits, c, verifier)
    verifier.verify(proof, g, h, G, H)


def test_bn254_gadget_suite(rng):
    """Range proof + set membership + Poseidon on BN254."""
    with using_curve("bn254"):
        G = get_generators("G", 512)
        H = get_generators("H", 512)
        g = G1.from_msg_hash(b"g")
        h = G1.from_msg_hash(b"h")

        proof, comms = bound_check.gen_proof_of_bounded_num(
            42, None, 0, 1 << 16, 16, rng, b"bn", g, h, G, H)
        bound_check.verify_proof_of_bounded_num(
            0, 1 << 16, 16, proof, comms, b"bn", g, h, G, H)

        sv = [Scalar(v) for v in (5, 9, 1, 100)]
        proof, comms = set_membership.gen_proof_of_set_membership(
            Scalar(9), None, sv, rng, b"bnset", g, h, G, H)
        set_membership.verify_proof_of_set_membership(
            sv, proof, comms, b"bnset", g, h, G, H)

        params = PoseidonParams(3, 4, 4, 55)
        xl, xr = Scalar.random(rng), Scalar.random(rng)
        image = Poseidon_hash_2(xl, xr, params, SboxType.Cube)
        proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_2(
            [xl, xr], None, image, params, SboxType.Cube, rng,
            b"bnpos", g, h, G, H)
        ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_2(
            image, params, SboxType.Cube, proof, comms, b"bnpos", g, h, G, H)


def test_secp256k1_range_proof(rng):
    """Third runtime curve (reference cargo feature `secp256k1`): same a=0
    complete formulas, 256-bit field."""
    with using_curve("secp256k1"):
        G = get_generators("G", 64)
        H = get_generators("H", 64)
        g = G1.from_msg_hash(b"g")
        h = G1.from_msg_hash(b"h")
        proof, comms = bound_check.gen_proof_of_bounded_num(
            4242, None, 0, 1 << 16, 16, rng, b"k1", g, h, G, H)
        bound_check.verify_proof_of_bounded_num(
            0, 1 << 16, 16, proof, comms, b"k1", g, h, G, H)
        params = PoseidonParams(5, 4, 4, 56)
        xl = [Scalar.random(rng) for _ in range(4)]
        from bulletproofs_tpu.models.helper_constraints.poseidon import \
            Poseidon_hash_4
        image = Poseidon_hash_4(xl, params, SboxType.Quint)
        proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_4(
            xl, None, image, params, SboxType.Quint, rng, b"k1p", g, h,
            get_generators("G", 1024), get_generators("H", 1024))
        ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_4(
            image, params, SboxType.Quint, proof, comms, b"k1p", g, h,
            get_generators("G", 1024), get_generators("H", 1024))
